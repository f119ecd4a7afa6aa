"""Mid-size end-to-end sampler parity: jax pipeline vs the torch/NumPy oracle.

The automated companion to the full-size study (tools/parity_fullsize.py,
recorded in docs/PARITY.md): one shared random weight set exported through
``export_srdiff_to_torch_keys``, one shared noise sequence, the FULL
ancestral chain run by both stacks (reference ``srdiff/model.py:1050-1091``)
— at a mid-size config (hidden=16, nb=2, T=10, 16→64) so it runs in CI time.
The full-size run on the reference's own images measured 81.0/80.6 dB
(cat/car) between the stacks; this test pins the same property permanently.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow  # builds torch twins + compiles a sampler scan


def test_midsize_chain_parity(rng):
    import jax

    from dgm_img_super_resolution_tpu.ckpt.torch_import import (
        export_srdiff_to_torch_keys,
    )
    from dgm_img_super_resolution_tpu.core.config import Hparams
    from dgm_img_super_resolution_tpu.inference import SRDiffPipeline
    from dgm_img_super_resolution_tpu.metrics.measure import Measure
    from parity_fullsize import torch_reference_sample

    hp = Hparams(
        compute_dtype="float32",
        hidden_size=16,
        rrdb_num_feat=8,
        rrdb_num_block=2,
        unet_dim_mults="1|2",
        timesteps=10,
    )
    lr_u8 = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)

    pipe = SRDiffPipeline(hp, rng=jax.random.PRNGKey(42))
    out_jax = pipe.upscale(lr_u8, jax.random.PRNGKey(7))
    assert out_jax.shape == (64, 64, 3)

    torch_sd = {
        k: np.asarray(v, np.float32)
        for k, v in export_srdiff_to_torch_keys(pipe.params).items()
    }
    out_torch = torch_reference_sample(torch_sd, lr_u8, hp, seed=7, steps=10)

    u8 = lambda a: np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)  # noqa: E731
    psnr = Measure().psnr(u8(out_jax), u8(out_torch))
    # one weight set, one noise sequence, ten sequential UNet steps in two
    # independently-written stacks: anything below ~50 dB means a real
    # framework divergence, not float noise
    assert psnr > 50.0, psnr