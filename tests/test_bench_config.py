"""bench.py must benchmark the quality-validated operating point: the mode
recorded by tools/ddim_operating_point.py, with env-var overrides."""

import json
import sys

sys.path.insert(0, ".")
from bench import resolve_operating_point  # noqa: E402


def test_defaults_without_record(tmp_path):
    op = resolve_operating_point(env={}, record_path=str(tmp_path / "missing.json"))
    assert op == {"sampler": "ddim", "steps": 20, "eta": 1.0, "enc_interval": 1}


def test_reads_validated_record(tmp_path):
    p = tmp_path / "DDIM_OPERATING_POINT.json"
    p.write_text(json.dumps({
        "operating_point": {"sampler": "ddim", "steps": 10, "eta": 1.0,
                            "enc_interval": 2}
    }))
    op = resolve_operating_point(env={}, record_path=str(p))
    assert op == {"sampler": "ddim", "steps": 10, "eta": 1.0, "enc_interval": 2}


def test_null_record_falls_back(tmp_path):
    p = tmp_path / "DDIM_OPERATING_POINT.json"
    p.write_text(json.dumps({"operating_point": None}))
    op = resolve_operating_point(env={}, record_path=str(p))
    assert op["steps"] == 20 and op["eta"] == 1.0


def test_env_overrides_record(tmp_path):
    p = tmp_path / "DDIM_OPERATING_POINT.json"
    p.write_text(json.dumps({"operating_point": {"sampler": "ddim", "steps": 10, "eta": 1.0}}))
    env = {"BENCH_SAMPLER": "ddpm", "BENCH_STEPS": "100", "BENCH_ETA": "0.0"}
    op = resolve_operating_point(env=env, record_path=str(p))
    assert op == {"sampler": "ddpm", "steps": 100, "eta": 0.0, "enc_interval": 1}
