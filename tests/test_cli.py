"""CLI smoke tests (tiny configs, virtual CPU devices)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from dgm_img_super_resolution_tpu.apps.cli import main

HP = (
    "hidden_size=8,rrdb_num_block=2,rrdb_num_feat=8,timesteps=4,"
    "unet_dim_mults=1|2,compute_dtype=float32"
)


@pytest.fixture
def img_dir(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for name in ("a.png", "b.png"):
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / name)
    return d


def test_cli_infer(tmp_path, img_dir):
    out = tmp_path / "sr.png"
    rc = main(["infer", str(img_dir / "a.png"), str(out), "-hp", HP])
    assert rc == 0
    sr = np.asarray(Image.open(out))
    assert sr.shape == (64, 64, 3)


def test_cli_infer_odd_size(tmp_path, img_dir, rng):
    """Arbitrary (odd) input sizes must SR at native resolution: the LR is
    reflect-padded so the UNet's down/up ladder closes, then cropped back
    (the reference crashes off its fixed 256² resize for such sizes)."""
    src = tmp_path / "odd.png"
    Image.fromarray(rng.integers(0, 256, (15, 17, 3), dtype=np.uint8)).save(src)
    out = tmp_path / "sr_odd.png"
    rc = main(["infer", str(src), str(out), "-hp", HP])
    assert rc == 0
    assert np.asarray(Image.open(out)).shape == (60, 68, 3)


def test_cli_test_dir_eval(tmp_path, img_dir, capsys):
    gen = tmp_path / "gen"
    rc = main(["test", str(img_dir), "--gen_dir", str(gen), "-hp", HP])
    assert rc == 0
    assert sorted(os.listdir(gen)) == ["a.png", "b.png"]
    last = capsys.readouterr().out.strip().splitlines()[-1]
    agg = json.loads(last)
    assert {"psnr", "ssim", "lr_psnr"} <= set(agg)


def test_cli_interp(tmp_path, img_dir):
    out = tmp_path / "mix.png"
    rc = main(
        ["interp", str(img_dir / "a.png"), str(img_dir / "b.png"), str(out),
         "--lam", "0.3", "-hp", HP]
    )
    assert rc == 0
    assert np.asarray(Image.open(out)).shape == (16, 16, 3)
