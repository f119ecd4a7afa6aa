"""Unit tests for schedules and the diffusion process against closed-form
NumPy, plus end-to-end sampler determinism on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.diffusion.schedule import (
    cosine_beta_schedule,
    get_beta_schedule,
    make_schedule,
)
from dgm_img_super_resolution_tpu.models.factory import build_srdiff, init_srdiff_params

TINY = Hparams(
    compute_dtype="float32",
    hidden_size=8,
    rrdb_num_block=3,
    rrdb_num_feat=8,
    timesteps=8,
)


def test_beta_schedule_variants_closed_form():
    T = 10
    lin = get_beta_schedule(T, "linear", 1e-4, 2e-2)
    np.testing.assert_allclose(lin, np.linspace(1e-4, 2e-2, T))
    quad = get_beta_schedule(T, "quad", 1e-4, 2e-2)
    np.testing.assert_allclose(quad, np.linspace(1e-2, np.sqrt(2e-2), T) ** 2)
    const = get_beta_schedule(T, "const", beta_end=0.5)
    np.testing.assert_allclose(const, 0.5)
    jsd = get_beta_schedule(T, "jsd")
    np.testing.assert_allclose(jsd, 1.0 / np.linspace(T, 1, T))
    w10 = get_beta_schedule(T, "warmup10", 1e-4, 2e-2)
    assert w10[0] == 1e-4 and np.all(w10[1:] == 2e-2)
    w50 = get_beta_schedule(T, "warmup50", 1e-4, 2e-2)
    np.testing.assert_allclose(w50[:5], np.linspace(1e-4, 2e-2, 5))


def test_cosine_schedule_nichol_dhariwal():
    T, s = 100, 0.008
    betas = cosine_beta_schedule(T, s)
    steps = T + 1
    x = np.linspace(0, steps, steps)
    acp = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    acp = acp / acp[0]
    want = np.clip(1 - acp[1:] / acp[:-1], 0, 0.999)
    np.testing.assert_allclose(betas, want)
    assert betas.shape == (T,)


def test_linear_res_mode_forces_last_beta():
    s = make_schedule(10, "linear", res=True)
    assert float(s.betas[-1]) == pytest.approx(0.999)
    s2 = make_schedule(10, "linear", res=False)
    assert float(s2.betas[-1]) == pytest.approx(2e-2)


def test_schedule_buffers_closed_form():
    s = make_schedule(100, "cosine", 0.008)
    # recompute in float64 from the formula (buffers are stored fp32)
    betas = cosine_beta_schedule(100, 0.008)
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod_prev), np.append(1.0, acp[:-1]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.sqrt_recip_alphas_cumprod), np.sqrt(1 / acp), rtol=1e-5)
    post_var = betas * (1 - np.append(1.0, acp[:-1])) / (1 - acp)
    np.testing.assert_allclose(np.asarray(s.posterior_variance), post_var, rtol=1e-5)
    # posterior mean coefs sum: c1·x0 + c2·xt is a convex-ish combination
    np.testing.assert_allclose(
        np.asarray(s.posterior_mean_coef1),
        betas * np.sqrt(np.append(1.0, acp[:-1])) / (1 - acp),
        rtol=1e-5,
    )


@pytest.fixture(scope="module")
def tiny_diffusion():
    d = build_srdiff(TINY)
    params = init_srdiff_params(d, jax.random.PRNGKey(0), TINY, hr_size=16)
    return d, params


def test_q_sample_t_minus_one_returns_x_start(tiny_diffusion):
    d, _ = tiny_diffusion
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    noise = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 3))
    t = jnp.array([-1, 3])
    out = d.q_sample(x, t, noise)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0]), atol=0)
    # and the t>=0 row follows the closed form
    want = (
        float(d.schedule.sqrt_alphas_cumprod[3]) * np.asarray(x[1])
        + float(d.schedule.sqrt_one_minus_alphas_cumprod[3]) * np.asarray(noise[1])
    )
    np.testing.assert_allclose(np.asarray(out[1]), want, rtol=1e-5)


def test_res_roundtrip(tiny_diffusion):
    d, _ = tiny_diffusion
    up = jnp.zeros((1, 8, 8, 3))
    hr = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3)) * 0.2, -0.4, 0.4)
    res = d.img2res(hr, up)
    back = d.res2img(res, up)
    np.testing.assert_allclose(np.asarray(back), np.asarray(hr), atol=1e-6)


def test_training_losses_finite_and_deterministic(tiny_diffusion):
    d, params = tiny_diffusion
    rng = jax.random.PRNGKey(42)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 2 - 1
    lr = jax.random.uniform(jax.random.PRNGKey(2), (2, 4, 4, 3)) * 2 - 1
    lr_up = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3)) * 2 - 1
    losses, imgs, t = d.training_losses(params, hr, lr, lr_up, rng)
    assert set(losses) == {"q"}  # fix_rrdb ⇒ no aux losses
    assert np.isfinite(float(losses["q"]))
    losses2, _, _ = d.training_losses(params, hr, lr, lr_up, rng)
    assert float(losses["q"]) == float(losses2["q"])
    assert imgs[0].shape == hr.shape


def test_sample_jitted_deterministic_and_shaped(tiny_diffusion):
    d, params = tiny_diffusion
    lr = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 4, 3)) * 2 - 1
    lr_up = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3)) * 2 - 1
    fn = jax.jit(lambda p, a, b, k: d.sample(p, a, b, k))
    img1, rrdb_out = fn(params, lr, lr_up, jax.random.PRNGKey(7))
    img2, _ = fn(params, lr, lr_up, jax.random.PRNGKey(7))
    img3, _ = fn(params, lr, lr_up, jax.random.PRNGKey(8))
    assert img1.shape == (1, 16, 16, 3)
    assert rrdb_out.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=0)
    assert np.abs(np.asarray(img1) - np.asarray(img3)).max() > 1e-4
    # res-mode output stays within [-1,1] of the upsampled base ±1/res_rescale
    assert np.isfinite(np.asarray(img1)).all()


def test_save_intermediate_stacks_all_steps(tiny_diffusion):
    d, params = tiny_diffusion
    lr = jnp.zeros((1, 4, 4, 3))
    lr_up = jnp.zeros((1, 16, 16, 3))
    img, rrdb_out, (inters, x0s) = d.sample(
        params, lr, lr_up, jax.random.PRNGKey(0), save_intermediate=True
    )
    assert inters.shape == (TINY["timesteps"], 1, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(inters[-1]), np.asarray(img), atol=0)


def test_ddim_sample_runs_and_is_deterministic_at_eta0(tiny_diffusion):
    d, params = tiny_diffusion
    lr = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 4, 3)) * 2 - 1
    lr_up = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3)) * 2 - 1
    fn = jax.jit(lambda p, a, b, k: d.ddim_sample(p, a, b, k, num_steps=4))
    i1, _ = fn(params, lr, lr_up, jax.random.PRNGKey(0))
    i2, _ = fn(params, lr, lr_up, jax.random.PRNGKey(1))
    # η=0: the only randomness is the initial draw
    assert i1.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(i1)).all()
    assert np.abs(np.asarray(i1) - np.asarray(i2)).max() > 0


def test_ddim_eta1_full_T_equals_ancestral_chain(tiny_diffusion):
    """η=1 DDIM over the FULL timestep sequence is algebraically the ancestral
    chain (σ² = posterior variance; the update means coincide via the
    recomputed-ε identity). This is the correctness basis of the fast
    operating point (docs/PARITY.md "DDIM operating point"): η=1 over a
    strided subsequence is the *respaced* ancestral sampler. Both paths share
    the per-step fold_in(rng, t) noise keys, so full-T outputs must agree to
    float32 accumulation error."""
    d, params = tiny_diffusion
    lr = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 4, 3)) * 2 - 1
    lr_up = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3)) * 2 - 1
    key = jax.random.PRNGKey(11)
    anc, _ = jax.jit(lambda p, a, b, k: d.sample(p, a, b, k))(params, lr, lr_up, key)
    ddim, _ = jax.jit(
        lambda p, a, b, k: d.ddim_sample(
            p, a, b, k, num_steps=d.num_timesteps, eta=1.0
        )
    )(params, lr, lr_up, key)
    np.testing.assert_allclose(np.asarray(ddim), np.asarray(anc), atol=2e-4)


def test_ddim_eta1_full_T_equals_ancestral_nonres():
    """Same identity in the non-residual regime: ddim_sample must start from
    q_sample(img_lr_up, T-1) exactly like the ancestral sampler
    (reference model.py:1070-1074), not from pure noise."""
    cfg = TINY.replace(res=False)
    d = build_srdiff(cfg)
    params = init_srdiff_params(d, jax.random.PRNGKey(0), cfg, hr_size=16)
    lr = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 4, 3)) * 2 - 1
    lr_up = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3)) * 2 - 1
    key = jax.random.PRNGKey(5)
    anc, _ = jax.jit(lambda p, a, b, k: d.sample(p, a, b, k))(params, lr, lr_up, key)
    ddim, _ = jax.jit(
        lambda p, a, b, k: d.ddim_sample(
            p, a, b, k, num_steps=d.num_timesteps, eta=1.0
        )
    )(params, lr, lr_up, key)
    np.testing.assert_allclose(np.asarray(ddim), np.asarray(anc), atol=2e-4)


def test_unet_encode_decode_composition_is_exact(tiny_diffusion):
    """mode="encode" ∘ mode="decode" must equal the full forward bitwise —
    the encoder-propagation fast path (arXiv 2312.09608) is built on this
    split being a pure refactor of the same program."""
    d, params = tiny_diffusion
    lr = jax.random.uniform(jax.random.PRNGKey(2), (2, 4, 4, 3)) * 2 - 1
    lr_up = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3)) * 2 - 1
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 3))
    t = jnp.array([3, 5], jnp.int32)
    _, cond = d.rrdb_cond(params, lr, lr_up)
    cond = d._project_cond(params, cond, lr_up)
    full = d._apply_denoise(params, x, t, cond, lr_up, True)
    enc = d._apply_encode(params, x, t, cond, lr_up)
    split = d._apply_decode(params, enc, t)
    np.testing.assert_allclose(np.asarray(split), np.asarray(full), atol=0)


def test_ddim_encoder_propagation(tiny_diffusion):
    """enc_interval=1 is exactly the plain DDIM path; enc_interval=2 with a
    non-divisible step count (remainder runs per-step) is deterministic,
    finite, and close to the exact chain (the reuse is an approximation)."""
    d, params = tiny_diffusion
    lr = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 4, 3)) * 2 - 1
    lr_up = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3)) * 2 - 1
    key = jax.random.PRNGKey(9)
    base, _ = d.ddim_sample(params, lr, lr_up, key, num_steps=5, eta=1.0)
    same, _ = d.ddim_sample(params, lr, lr_up, key, num_steps=5, eta=1.0, enc_interval=1)
    np.testing.assert_allclose(np.asarray(same), np.asarray(base), atol=0)
    ep, _ = d.ddim_sample(params, lr, lr_up, key, num_steps=5, eta=1.0, enc_interval=2)
    ep2, _ = d.ddim_sample(params, lr, lr_up, key, num_steps=5, eta=1.0, enc_interval=2)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(ep2), atol=0)
    assert np.isfinite(np.asarray(ep)).all()
    # approximate, not identical — but the same chain up to encoder staleness
    assert 0 < np.abs(np.asarray(ep) - np.asarray(base)).max() < 0.5


def test_lane_padded_carry_equal(tiny_diffusion, monkeypatch):
    """DGMSR_PAD_CARRY pads the sampler carry to 4 lanes for TPU layout
    efficiency; lane 3 is identically zero (noise is drawn at 3 lanes and
    zero-padded; the UNet final conv zero-pads its output), so the padded
    samplers compute the SAME math on lanes 0–2 — across ancestral, DDIM
    η∈{0,1}, and encoder-propagation paths. Per-step components are bitwise
    equal when compiled alone; inside a compiled scan XLA fuses the 4-lane
    body differently, so the chain is pinned at float-rounding tolerance
    (~1e-6 observed over the 8-step tiny chain)."""
    d, params = tiny_diffusion
    lr = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 4, 3)) * 2 - 1
    lr_up = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3)) * 2 - 1
    key = jax.random.PRNGKey(21)

    runs = {
        "anc": lambda: d.sample(params, lr, lr_up, key)[0],
        "ddim0": lambda: d.ddim_sample(params, lr, lr_up, key, num_steps=4)[0],
        "ddim1": lambda: d.ddim_sample(params, lr, lr_up, key, num_steps=4, eta=1.0)[0],
        "encprop": lambda: d.ddim_sample(
            params, lr, lr_up, key, num_steps=4, eta=1.0, enc_interval=2
        )[0],
    }
    for name, fn in runs.items():
        monkeypatch.setenv("DGMSR_PAD_CARRY", "0")
        plain = np.asarray(fn())
        monkeypatch.setenv("DGMSR_PAD_CARRY", "1")
        padded = np.asarray(fn())
        assert plain.shape == padded.shape == (1, 16, 16, 3), name
        np.testing.assert_allclose(padded, plain, atol=1e-5, err_msg=name)


def test_flat_carry_equal(tiny_diffusion, monkeypatch):
    """DGMSR_FLAT_CARRY carries the scan state as (B,H,W·C) so the
    elementwise update math gets a lane-dense minor dim (the profiled
    {2,3,1,0}↔{3,2,1,0} relayout copies disappear). Elementwise math is
    shape-agnostic and the noise stream is drawn at the 4D shape then
    flattened, so the flat sampler equals the 4D one — across ancestral,
    DDIM η∈{0,1}, encoder-propagation, and both PAD_CARRY settings (XLA
    re-fusion rounding tolerance, as for the pad-carry pin)."""
    d, params = tiny_diffusion
    lr = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 4, 3)) * 2 - 1
    lr_up = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3)) * 2 - 1
    key = jax.random.PRNGKey(22)

    runs = {
        "anc": lambda: d.sample(params, lr, lr_up, key)[0],
        "ddim1": lambda: d.ddim_sample(params, lr, lr_up, key, num_steps=4, eta=1.0)[0],
        "encprop": lambda: d.ddim_sample(
            params, lr, lr_up, key, num_steps=4, eta=1.0, enc_interval=2
        )[0],
    }
    for pad in ("0", "1"):
        monkeypatch.setenv("DGMSR_PAD_CARRY", pad)
        for name, fn in runs.items():
            monkeypatch.setenv("DGMSR_FLAT_CARRY", "0")
            plain = np.asarray(fn())
            monkeypatch.setenv("DGMSR_FLAT_CARRY", "1")
            flat = np.asarray(fn())
            assert plain.shape == flat.shape == (1, 16, 16, 3), (name, pad)
            np.testing.assert_allclose(flat, plain, atol=1e-5,
                                       err_msg=f"{name} pad={pad}")


def test_interpolate_runs(tiny_diffusion):
    d, params = tiny_diffusion
    x1 = jnp.zeros((1, 16, 16, 3))
    x2 = jnp.ones((1, 16, 16, 3)) * 0.5
    lr = jnp.zeros((1, 4, 4, 3))
    lr_up = jnp.zeros((1, 16, 16, 3))
    out = d.interpolate(params, x1, x2, lr, lr_up, jax.random.PRNGKey(0), t=4, lam=0.5)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_golden_regression():
    """Pin the full ancestral-sampler numerics against a stored golden output
    (float32, fixed seeds) — catches accidental drift from future kernel or
    schedule rewrites. Regenerate tests/golden/sampler_tiny.npz ONLY for an
    intentional semantics change."""
    import os

    import numpy as np

    from dgm_img_super_resolution_tpu.core.config import Hparams
    from dgm_img_super_resolution_tpu.models.factory import build_srdiff, init_srdiff_params

    hp = Hparams(hidden_size=8, rrdb_num_block=3, rrdb_num_feat=8, timesteps=8,
                 unet_dim_mults="1|2", compute_dtype="float32")
    d = build_srdiff(hp)
    params = init_srdiff_params(d, jax.random.PRNGKey(123), hp, hr_size=16)
    rng = np.random.default_rng(7)
    lr = jnp.asarray(rng.uniform(-1, 1, (1, 4, 4, 3)).astype(np.float32))
    lr_up = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    img, _ = jax.jit(lambda p, a, b, k: d.sample(p, a, b, k))(
        params, lr, lr_up, jax.random.PRNGKey(99)
    )
    golden = np.load(os.path.join(os.path.dirname(__file__), "golden", "sampler_tiny.npz"))
    np.testing.assert_allclose(np.asarray(img), golden["img"], atol=2e-4)


def test_hoisted_cond_fold_matches_per_step_path(tiny_diffusion):
    """The sampler's hoist (cond projection + up_proj folded into one
    scan-invariant tensor, added after down stage 0) must equal the
    training-path formulation that computes up_proj inside the forward —
    pure reassociation of one add."""
    d, params = tiny_diffusion
    lr = jax.random.uniform(jax.random.PRNGKey(2), (2, 4, 4, 3)) * 2 - 1
    lr_up = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3)) * 2 - 1
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 3))
    t = jnp.array([3, 5], jnp.int32)
    _, cond = d.rrdb_cond(params, lr, lr_up)
    want = d._apply_denoise(params, x, t, cond, lr_up, False)
    folded = d._project_cond(params, cond, lr_up)
    got = d._apply_denoise(params, x, t, folded, lr_up, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
