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


def test_reference_env_aliases_land_on_canonical_knobs():
    """The reference's MIMICIV_* alias names (env_config.py:345-511) apply."""
    cfg = load_cfg(environ={
        "MIMICIV_CAP_ACT": "sigmoid_gate",
        "MIMICIV_CAP_PC_DIM": "24",
        "MIMICIV_CAP_ITERS": "4",
        "MIMICIV_BS": "8",
        "MIMICIV_GRAD_CLIP_NORM": "0.7",
        "MIMICIV_LAMBDA_ROUTE_ENTROPY": "0.01",
        "MIMICIV_ROUTE_GATE_TEMP": "2.0",
        "MIMICIV_TEXT_MODEL": "bert-base-uncased",
        "MIMICIV_STRUCT_SEQ_LEN": "24",
        "MIMICIV_CKPT_ROOT": "/tmp/ckpts",
        "MIMICIV_DEBUG_SAMPLES": "128",
    })
    assert cfg.model.capsule_act_type == "sigmoid_gate"
    assert cfg.model.pc_dim == 24
    assert cfg.model.num_routing == 4
    assert cfg.train.batch_size == 8
    assert cfg.train.grad_clip == 0.7
    assert cfg.train.routing_entropy_bonus == 0.01
    assert cfg.model.gate_temp == 2.0
    assert cfg.encoder.text_model_name == "bert-base-uncased"
    assert cfg.encoder.structured_seq_len == 24
    assert cfg.out_dir == "/tmp/ckpts"
    assert cfg.train.max_train_patients == 128


def test_env_value_transforms():
    cfg = load_cfg(environ={
        "MIMICIV_TASK": "phenotyping",
        "MIMICIV_LOSS": "focal",
        "MIMICIV_USE_GATES": "1",
    })
    assert cfg.model.task == "pheno"
    assert cfg.train.use_focal is True
    assert cfg.model.capsule_act_type == "sigmoid_gate"
    cfg2 = load_cfg(environ={"MIMICIV_USE_GATES": "0", "MIMICIV_LOSS": "bce"})
    assert cfg2.model.capsule_act_type == "ONES"
    assert cfg2.train.use_focal is False


def test_env_unknown_and_inert_keys_warn():
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        cfg = load_cfg(environ={
            "MIMICIV_NO_SUCH_KNOB": "1",      # unknown -> warn, skipped
            "MIMICIV_BERT_CHUNK_BS": "16",    # recognized-but-inert -> warn
            "MIMICIV_LR": "1e-3",             # valid -> applies silently
        })
    assert cfg.train.lr == 1e-3
    msgs = [str(r.message) for r in rec]
    assert any("NO_SUCH_KNOB" in m for m in msgs), msgs
    assert any("BERT_CHUNK_BS" in m and "no effect" in m for m in msgs), msgs
