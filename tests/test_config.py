import os

import yaml

from dgm_img_super_resolution_tpu.core.config import Hparams, load_config, set_hparams


def test_defaults_match_reference_srdiff_setup():
    hp = Hparams()
    assert hp["timesteps"] == 100
    assert hp["beta_schedule"] == "cosine"
    assert hp["res"] is True
    assert hp["res_rescale"] == 2.0
    assert hp["rrdb_num_block"] == 8
    assert hp["rrdb_num_feat"] == 32
    assert hp["hidden_size"] == 64
    assert hp.unet_dim_mults_tuple == (1, 2, 3, 4)
    assert hp["gn_groups"] == 0
    assert hp["sr_scale"] == 4
    assert hp.lr == 2e-4  # attribute access


def test_yaml_cascade_and_missing_base(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"lr": 1e-3, "hidden_size": 32}))
    child = tmp_path / "child.yaml"
    child.write_text(
        yaml.safe_dump(
            {"base_config": ["./base.yaml", "./missing.yaml"], "hidden_size": 96}
        )
    )
    cfg = load_config(str(child))
    assert cfg == {"lr": 1e-3, "hidden_size": 96}


def test_dotted_overrides_and_type_coercion(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text(yaml.safe_dump({"lr": 2e-4, "res": True, "timesteps": 100}))
    hp = set_hparams(str(cfg), hparams_str="lr=1e-5,res=false,timesteps=50,new_key=[1,2]")
    assert hp["lr"] == 1e-5
    assert hp["res"] is False
    assert hp["timesteps"] == 50
    assert hp["new_key"] == [1, 2]


def test_exp_name_persists_config(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    hp = set_hparams(exp_name="exp1", hparams_str="lr=5e-4")
    saved = os.path.join("checkpoints", "exp1", "config.yaml")
    assert os.path.exists(saved)
    hp2 = set_hparams(exp_name="exp1")
    assert hp2["lr"] == 5e-4
    assert hp["work_dir"] == hp2["work_dir"]


def test_replace_is_functional():
    hp = Hparams()
    hp2 = hp.replace(timesteps=7)
    assert hp["timesteps"] == 100 and hp2["timesteps"] == 7
