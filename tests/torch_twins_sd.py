"""Independent PyTorch twins of the SD x4-upscaler stack, for activation
parity tests (tests/test_sd_torch_parity.py).

These are written FROM THE PUBLISHED ARCHITECTURE SPECS (the diffusers
``UNet2DConditionModel``/``AutoencoderKL`` and transformers ``CLIPTextModel``
module layouts and forward semantics as documented for
``stabilityai/stable-diffusion-x4-upscaler`` — the pipeline the reference
loads at ``st_app2.py:15-27``), NOT from this repo's Flax code: they are the
oracle the Flax models are checked against, exactly as
``tests/test_torch_parity.py`` does for the SRDiff stack (VERDICT r2
missing #1).

Two independence properties make the check non-circular:

- module/parameter names here follow the published checkpoint key schema, so
  a random state dict enumerated by ``ckpt/sd_inventory.py`` must load with
  ``strict=True`` — any disagreement between the inventory and a real
  ``nn.Module`` realisation of the published layout fails loudly;
- the same state dict reaches the Flax side only through the importer's rule
  table (``ckpt/sd_import.convert_component``), so a wrong rule, layout
  transform, or Flax module semantics breaks activation parity.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _gn(channels: int, preferred: int = 32) -> int:
    """Largest group count ≤ preferred dividing channels (tiny-config analog
    of the published norm_num_groups=32, which divides every real width)."""
    g = min(preferred, channels)
    while channels % g:
        g -= 1
    return g


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers ``get_timestep_embedding`` with ``flip_sin_to_cos=True``,
    ``downscale_freq_shift=0`` (how ``UNet2DConditionModel`` configures its
    ``Timesteps`` projection): freqs exp(-ln(1e4)·i/half), [cos, sin]."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


# --------------------------------------------------------------------- UNet

class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D: GN→SiLU→conv3x3→(+time)→GN→SiLU→conv3x3,
    1×1 conv_shortcut when channels change; UNet norm eps 1e-5."""

    def __init__(self, cin: int, cout: int, tdim: int | None, eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(_gn(cin), cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if tdim is not None:
            self.time_emb_proj = nn.Linear(tdim, cout)
        self.norm2 = nn.GroupNorm(_gn(cout), cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)
        self._has_short = cin != cout
        self._has_time = tdim is not None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if self._has_time:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self._has_short:
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    """diffusers Attention: bias-free q/k/v, to_out = [Linear, Dropout]."""

    def __init__(self, dim: int, heads: int, kv_dim: int | None = None):
        super().__init__()
        kv_dim = kv_dim if kv_dim is not None else dim
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(kv_dim, dim, bias=False)
        self.to_v = nn.Linear(kv_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, lq, c = x.shape
        hd = c // self.heads
        q = self.to_q(x).view(b, lq, self.heads, hd).transpose(1, 2)
        k = self.to_k(context).view(b, -1, self.heads, hd).transpose(1, 2)
        v = self.to_v(context).view(b, -1, self.heads, hd).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-1, -2)) * hd**-0.5
        probs = scores.float().softmax(dim=-1).to(q.dtype)
        out = torch.matmul(probs, v).transpose(1, 2).reshape(b, lq, c)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)  # torch default: exact erf gelu


class FeedForward(nn.Module):
    """diffusers FeedForward: net = [GEGLU, Dropout, Linear]."""

    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        self.net = nn.ModuleList(
            [GEGLU(dim, dim * mult), nn.Dropout(0.0), nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    """Pre-LN: attn1 (self, or cross when only_cross_attention), attn2
    (cross), GEGLU ff; torch LayerNorm default eps 1e-5."""

    def __init__(self, dim: int, heads: int, cross_dim: int, only_cross: bool):
        super().__init__()
        self.only_cross = only_cross
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, cross_dim if only_cross else None)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x), context if self.only_cross else None)
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    """GN(32, eps 1e-6) → flatten → Linear proj_in (use_linear_projection)
    → blocks → Linear proj_out → residual."""

    def __init__(self, ch: int, heads: int, cross_dim: int, only_cross: bool,
                 depth: int = 1):
        super().__init__()
        self.norm = nn.GroupNorm(_gn(ch), ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, heads, cross_dim, only_cross) for _ in range(depth)]
        )
        self.proj_out = nn.Linear(ch, ch)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, context)
        y = self.proj_out(y)
        return res + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


class _Downsample(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class _Upsample(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _DownBlock(nn.Module):
    def __init__(self, cin, cout, tdim, layers, heads, cross_dim, attn,
                 only_cross, add_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(cin if j == 0 else cout, cout, tdim) for j in range(layers)]
        )
        if attn:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(cout, heads, cross_dim, only_cross) for _ in range(layers)]
            )
        self._attn = attn
        if add_down:
            self.downsamplers = nn.ModuleList([_Downsample(cout)])
        self._down = add_down

    def forward(self, h, temb, ctx, skips):
        for j, res in enumerate(self.resnets):
            h = res(h, temb)
            if self._attn:
                h = self.attentions[j](h, ctx)
            skips.append(h)
        if self._down:
            h = self.downsamplers[0](h)
            skips.append(h)
        return h


class _UpBlock(nn.Module):
    def __init__(self, prev, cin, cout, tdim, layers, heads, cross_dim, attn,
                 only_cross, add_up):
        super().__init__()
        res = []
        for j in range(layers + 1):
            skip = cin if j == layers else cout
            rin = prev if j == 0 else cout
            res.append(ResnetBlock2D(rin + skip, cout, tdim))
        self.resnets = nn.ModuleList(res)
        if attn:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(cout, heads, cross_dim, only_cross) for _ in range(layers + 1)]
            )
        self._attn = attn
        if add_up:
            self.upsamplers = nn.ModuleList([_Upsample(cout)])
        self._up = add_up

    def forward(self, h, temb, ctx, skips):
        for j, res in enumerate(self.resnets):
            h = torch.cat([h, skips.pop()], dim=1)
            h = res(h, temb)
            if self._attn:
                h = self.attentions[j](h, ctx)
        if self._up:
            h = self.upsamplers[0](h)
        return h


class _MidBlock(nn.Module):
    def __init__(self, ch, tdim, heads, cross_dim):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, tdim), ResnetBlock2D(ch, ch, tdim)]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModel(ch, heads, cross_dim, only_cross=False)]
        )

    def forward(self, h, temb, ctx):
        h = self.resnets[0](h, temb)
        h = self.attentions[0](h, ctx)
        return self.resnets[1](h, temb)


class UNet2DConditionTwin(nn.Module):
    """The published x4-upscaler UNet layout, built from a diffusers-style
    config dict (cf. ckpt/sd_inventory.X4_UNET_CONFIG). ``attention_head_dim``
    carries the SD-era meaning: the HEAD COUNT."""

    def __init__(self, cfg: dict):
        super().__init__()
        chs = list(cfg["block_out_channels"])
        lpb = cfg["layers_per_block"]
        cross = cfg["cross_attention_dim"]
        heads = cfg["attention_head_dim"]
        tdim = chs[0] * 4
        down_attn = ["CrossAttn" in t for t in cfg["down_block_types"]]
        up_attn = ["CrossAttn" in t for t in cfg["up_block_types"]]
        oc = list(cfg.get("only_cross_attention") or [False] * len(chs))
        self._ch0 = chs[0]

        self.conv_in = nn.Conv2d(cfg["in_channels"], chs[0], 3, padding=1)
        te = nn.Module()
        te.linear_1 = nn.Linear(chs[0], tdim)
        te.linear_2 = nn.Linear(tdim, tdim)
        self.time_embedding = te
        if cfg.get("num_class_embeds"):
            self.class_embedding = nn.Embedding(cfg["num_class_embeds"], tdim)

        blocks = []
        cin = chs[0]
        for i, ch in enumerate(chs):
            blocks.append(_DownBlock(
                cin, ch, tdim, lpb, heads, cross, down_attn[i], oc[i],
                add_down=i < len(chs) - 1,
            ))
            cin = ch
        self.down_blocks = nn.ModuleList(blocks)

        self.mid_block = _MidBlock(chs[-1], tdim, heads, cross)

        rev = chs[::-1]
        ups = []
        prev = rev[0]
        for i in range(len(chs)):
            out_ch = rev[i]
            in_ch = rev[min(i + 1, len(chs) - 1)]
            level = len(chs) - 1 - i
            ups.append(_UpBlock(
                prev, in_ch, out_ch, tdim, lpb, heads, cross, up_attn[i],
                oc[level], add_up=i < len(chs) - 1,
            ))
            prev = out_ch
        self.up_blocks = nn.ModuleList(ups)

        self.conv_norm_out = nn.GroupNorm(_gn(chs[0]), chs[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chs[0], cfg["out_channels"], 3, padding=1)

    def forward(self, x, timesteps, encoder_hidden_states, class_labels=None):
        temb = timestep_embedding(timesteps, self._ch0)
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(temb)))
        if class_labels is not None:
            temb = temb + self.class_embedding(class_labels)
        ctx = encoder_hidden_states
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            h = blk(h, temb, ctx, skips)
        h = self.mid_block(h, temb, ctx)
        for blk in self.up_blocks:
            h = blk(h, temb, ctx, skips)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------- VAE

class VAEResnet(nn.Module):
    def __init__(self, cin: int, cout: int, eps: float = 1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(_gn(cin), cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(_gn(cout), cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)
        self._has_short = cin != cout

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self._has_short:
            x = self.conv_shortcut(x)
        return x + h


class LegacyAttentionBlock(nn.Module):
    """diffusers legacy AttentionBlock (the key schema the published VAE
    ships): group_norm, query/key/value Linears, proj_attn; single head."""

    def __init__(self, ch: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(_gn(ch), ch, eps=1e-6)
        self.query = nn.Linear(ch, ch)
        self.key = nn.Linear(ch, ch)
        self.value = nn.Linear(ch, ch)
        self.proj_attn = nn.Linear(ch, ch)

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.query(y), self.key(y), self.value(y)
        scores = torch.bmm(q, k.transpose(1, 2)) * c**-0.5
        probs = scores.float().softmax(dim=-1).to(y.dtype)
        y = self.proj_attn(torch.bmm(probs, v))
        return x + y.transpose(1, 2).view(b, c, h, w)


class _VAEDown(nn.Module):
    def __init__(self, cin, cout, layers, add_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [VAEResnet(cin if j == 0 else cout, cout) for j in range(layers)]
        )
        if add_down:
            ds = nn.Module()
            ds.conv = nn.Conv2d(cout, cout, 3, stride=2, padding=0)
            self.downsamplers = nn.ModuleList([ds])
        self._down = add_down

    def forward(self, h):
        for res in self.resnets:
            h = res(h)
        if self._down:
            # diffusers Downsample2D with padding=0: asymmetric (0,1,0,1) pad
            h = self.downsamplers[0].conv(F.pad(h, (0, 1, 0, 1)))
        return h


class _VAEUp(nn.Module):
    def __init__(self, cin, cout, layers, add_up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [VAEResnet(cin if j == 0 else cout, cout) for j in range(layers + 1)]
        )
        if add_up:
            self.upsamplers = nn.ModuleList([_Upsample(cout)])
        self._up = add_up

    def forward(self, h):
        for res in self.resnets:
            h = res(h)
        if self._up:
            h = self.upsamplers[0](h)
        return h


class _VAEMid(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = nn.ModuleList([VAEResnet(ch, ch), VAEResnet(ch, ch)])
        self.attentions = nn.ModuleList([LegacyAttentionBlock(ch)])

    def forward(self, h):
        return self.resnets[1](self.attentions[0](self.resnets[0](h)))


class _VAEEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = list(cfg["block_out_channels"])
        lpb = cfg["layers_per_block"]
        self.conv_in = nn.Conv2d(cfg["in_channels"], chs[0], 3, padding=1)
        blocks, cin = [], chs[0]
        for i, ch in enumerate(chs):
            blocks.append(_VAEDown(cin, ch, lpb, add_down=i < len(chs) - 1))
            cin = ch
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = _VAEMid(chs[-1])
        self.conv_norm_out = nn.GroupNorm(_gn(chs[-1]), chs[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[-1], 2 * cfg["latent_channels"], 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            h = blk(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class _VAEDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        rev = list(cfg["block_out_channels"])[::-1]
        lpb = cfg["layers_per_block"]
        self.conv_in = nn.Conv2d(cfg["latent_channels"], rev[0], 3, padding=1)
        self.mid_block = _VAEMid(rev[0])
        blocks, prev = [], rev[0]
        for i, ch in enumerate(rev):
            blocks.append(_VAEUp(prev, ch, lpb, add_up=i < len(rev) - 1))
            prev = ch
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(_gn(rev[-1]), rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], cfg["out_channels"], 3, padding=1)

    def forward(self, z):
        h = self.mid_block(self.conv_in(z))
        for blk in self.up_blocks:
            h = blk(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class AutoencoderKLTwin(nn.Module):
    def __init__(self, cfg: dict):
        super().__init__()
        lat = cfg["latent_channels"]
        self.encoder = _VAEEncoder(cfg)
        self.decoder = _VAEDecoder(cfg)
        self.quant_conv = nn.Conv2d(2 * lat, 2 * lat, 1)
        self.post_quant_conv = nn.Conv2d(lat, lat, 1)
        self.scaling_factor = cfg.get("scaling_factor", 0.08333)

    def encode_mean(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, _ = moments.chunk(2, dim=1)
        return mean * self.scaling_factor

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z / self.scaling_factor))


# --------------------------------------------------------------------- CLIP

class CLIPTextTwin(nn.Module):
    """transformers CLIPTextModel layout: pre-LN causal transformer, q-scaled
    attention, hidden_act from config (SD2: exact gelu), LN eps 1e-5."""

    def __init__(self, cfg: dict):
        super().__init__()
        d = cfg["hidden_size"]
        self.heads = cfg["num_attention_heads"]
        self.act = cfg.get("hidden_act", "gelu")
        eps = cfg.get("layer_norm_eps", 1e-5)

        emb = nn.Module()
        emb.token_embedding = nn.Embedding(cfg["vocab_size"], d)
        emb.position_embedding = nn.Embedding(cfg["max_position_embeddings"], d)
        layers = []
        for _ in range(cfg["num_hidden_layers"]):
            layer = nn.Module()
            sa = nn.Module()
            for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
                setattr(sa, name, nn.Linear(d, d))
            layer.self_attn = sa
            layer.layer_norm1 = nn.LayerNorm(d, eps=eps)
            layer.layer_norm2 = nn.LayerNorm(d, eps=eps)
            mlp = nn.Module()
            mlp.fc1 = nn.Linear(d, cfg["intermediate_size"])
            mlp.fc2 = nn.Linear(cfg["intermediate_size"], d)
            layer.mlp = mlp
            layers.append(layer)
        enc = nn.Module()
        enc.layers = nn.ModuleList(layers)
        tm = nn.Module()
        tm.embeddings = emb
        tm.encoder = enc
        tm.final_layer_norm = nn.LayerNorm(d, eps=eps)
        self.text_model = tm

    def _act(self, x):
        if self.act == "gelu":
            return F.gelu(x)
        if self.act == "quick_gelu":
            return x * torch.sigmoid(1.702 * x)
        raise ValueError(self.act)

    def forward(self, token_ids: torch.Tensor) -> torch.Tensor:
        tm = self.text_model
        b, l = token_ids.shape
        pos = torch.arange(l)
        x = tm.embeddings.token_embedding(token_ids) + tm.embeddings.position_embedding(pos)[None]
        mask = torch.full((l, l), torch.finfo(torch.float32).min).triu(1)[None, None]
        for layer in tm.encoder.layers:
            h = layer.layer_norm1(x)
            sa = layer.self_attn
            hd = x.shape[-1] // self.heads
            q = sa.q_proj(h).view(b, l, self.heads, hd).transpose(1, 2) * hd**-0.5
            k = sa.k_proj(h).view(b, l, self.heads, hd).transpose(1, 2)
            v = sa.v_proj(h).view(b, l, self.heads, hd).transpose(1, 2)
            scores = torch.matmul(q, k.transpose(-1, -2)) + mask
            probs = scores.float().softmax(dim=-1).to(h.dtype)
            att = torch.matmul(probs, v).transpose(1, 2).reshape(b, l, -1)
            x = x + sa.out_proj(att)
            h = layer.layer_norm2(x)
            x = x + layer.mlp.fc2(self._act(layer.mlp.fc1(h)))
        return tm.final_layer_norm(x)
