"""TensorBoard event writer: wire-format round-trip + trainer integration.

The reference config's ``tb_log_interval`` (``srdiff/config.yaml:60``) names a
TensorBoard cadence; the trainer honors it with real TB event files (plus the
JSONL log). The decoder here is written from the TFRecord/proto wire spec,
independent of the writer's encoder internals.
"""

from __future__ import annotations

import struct

import pytest

from dgm_img_super_resolution_tpu.utils import tbwriter

slow = pytest.mark.slow


def _decode_event(data: bytes) -> dict:
    """Minimal proto decode of Event{wall_time=1, step=2, file_version=3,
    summary=5{value=1{tag=1, simple_value=2}}}."""
    out: dict = {}
    i = 0

    def varint(buf, i):
        n = shift = 0
        while True:
            b = buf[i]
            n |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                return n, i
            shift += 7

    while i < len(data):
        key, i = varint(data, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, i = varint(data, i)
        elif wire == 1:
            (val,) = struct.unpack("<d", data[i : i + 8])
            i += 8
        elif wire == 5:
            (val,) = struct.unpack("<f", data[i : i + 4])
            i += 4
        elif wire == 2:
            n, i = varint(data, i)
            val = data[i : i + n]
            i += n
        else:
            raise AssertionError(f"wire type {wire}")
        if field == 1 and wire == 1:
            out["wall_time"] = val
        elif field == 2:
            out["step"] = val
        elif field == 3:
            out["file_version"] = val.decode()
        elif field == 5:
            # summary → repeated Value → {tag, simple_value}
            v, j = varint(val, 0)
            assert v >> 3 == 1
            n, j = varint(val, j)
            inner = val[j : j + n]
            k = 0
            while k < len(inner):
                key2, k = varint(inner, k)
                f2, w2 = key2 >> 3, key2 & 7
                if f2 == 1 and w2 == 2:
                    n2, k = varint(inner, k)
                    out["tag"] = inner[k : k + n2].decode()
                    k += n2
                elif f2 == 2 and w2 == 5:
                    (out["simple_value"],) = struct.unpack("<f", inner[k : k + 4])
                    k += 4
                else:
                    raise AssertionError((f2, w2))
    return out


def test_tb_scalar_roundtrip(tmp_path):
    w = tbwriter.TBWriter(str(tmp_path))
    w.add_scalar("loss", 0.25, 7)
    w.add_scalar("train/psnr", 31.5, 8)
    w.close()
    recs = [_decode_event(r) for r in tbwriter.read_records(w.path)]
    assert recs[0]["file_version"] == "brain.Event:2"
    assert recs[1] == {
        "wall_time": recs[1]["wall_time"], "step": 7, "tag": "loss",
        "simple_value": 0.25,
    }
    assert recs[2]["tag"] == "train/psnr" and abs(recs[2]["simple_value"] - 31.5) < 1e-5
    assert recs[2]["step"] == 8


def test_crc32c_known_vectors():
    # published CRC-32C test vectors (RFC 3720 appendix B.4 style)
    assert tbwriter.crc32c(b"") == 0
    assert tbwriter.crc32c(b"123456789") == 0xE3069283
    assert tbwriter.crc32c(bytes(32)) == 0x8A9136AA


@slow
def test_trainer_emits_tb_events_and_save_codes(rng, tmp_path):
    import glob
    import os

    import jax
    import numpy as np

    from dgm_img_super_resolution_tpu.parallel.mesh import make_mesh
    from dgm_img_super_resolution_tpu.train.tasks.srdiff import SRDiffTask
    from tests.test_train_parallel import TINY, _make_batch

    hp = TINY.replace(
        val_check_interval=0, max_updates=2, tb_log_interval=1,
        save_codes=["utils", "not_a_dir"],
    )
    task = SRDiffTask(hp)
    trainer = task.make_trainer(mesh=make_mesh("dp=8"))
    trainer.work_dir = str(tmp_path)
    batch = _make_batch(rng)
    trainer.fit((batch for _ in range(10)), jax.random.PRNGKey(0), max_updates=2,
                resume=False)
    # TB event file exists and carries the logged scalars at both steps
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1, files
    recs = [_decode_event(r) for r in tbwriter.read_records(files[0])]
    loss_steps = sorted(r["step"] for r in recs if r.get("tag") == "loss")
    assert loss_steps == [1, 2]
    assert all(np.isfinite(r["simple_value"]) for r in recs if "simple_value" in r)
    # save_codes snapshotted the listed package dirs (missing ones skipped)
    assert os.path.isfile(tmp_path / "codes" / "utils" / "tbwriter.py")
    assert not os.path.exists(tmp_path / "codes" / "not_a_dir")
