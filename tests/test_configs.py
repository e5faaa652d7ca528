"""Config system + shipped workload configs."""
import json
import os

import pytest

from multimodalrouting_tpu.configs import Config, apply_overrides, from_dict, load_cfg, to_dict

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def test_defaults_match_reference_flagship():
    cfg = Config()
    # reference env_config.py:70-179 defaults
    assert cfg.model.d == 256
    assert cfg.train.batch_size == 16
    assert cfg.train.lr == 2e-4
    assert cfg.model.pc_dim == 32 and cfg.model.mc_caps_dim == 64
    assert cfg.model.num_routing == 3
    assert cfg.encoder.structured_seq_len == 48 and cfg.encoder.structured_n_feats == 76


def test_override_precedence(tmp_path):
    f = tmp_path / "c.json"
    f.write_text(json.dumps({"model": {"pc_dim": 16}, "train": {"lr": 1e-3}}))
    cfg = load_cfg(
        str(f),
        overrides={"train.lr": 5e-4},
        environ={"MIMICIV_PC_DIM": "24"},
    )
    assert cfg.model.pc_dim == 24  # env beats file
    assert cfg.train.lr == 5e-4  # explicit beats env/file


def test_bare_key_and_validation():
    cfg = apply_overrides(Config(), {"pc_dim": 8})
    assert cfg.model.pc_dim == 8
    with pytest.raises(KeyError):
        apply_overrides(Config(), {"not_a_knob": 1})
    with pytest.raises(ValueError):
        load_cfg(overrides={"model.routes": "9"}, environ={})


def test_prior_clamping():
    cfg = load_cfg(
        overrides={"model.route_prior_floor": "-0.5", "model.route_prior_ceiling": "2.0"},
        environ={},
    )
    assert cfg.model.route_prior_floor == 0.0
    assert cfg.model.route_prior_ceiling == 1.0


def test_roundtrip_dict():
    cfg = apply_overrides(Config(), {"model.pc_dim": 12, "verbose": True})
    back = from_dict(to_dict(cfg))
    assert back.model.pc_dim == 12 and back.verbose is True


@pytest.mark.parametrize(
    "name", ["unimodal_L", "bimodal_LN", "trimodal_mort", "pheno_25", "fame_missing"]
)
def test_shipped_workload_configs_load(name):
    cfg = load_cfg(os.path.join(CONFIG_DIR, f"{name}.yaml"), environ={})
    assert cfg.model.task in ("mort", "pheno", "multitask")
    assert cfg.model.routes in ("7", "10")
