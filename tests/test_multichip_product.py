"""Product-path multi-chip training (VERDICT r2 item 2).

`train_model` with train.num_data_shards/num_model_shards > 1 must build the
('data','model') mesh itself, replicate state, shard every train/eval batch
over 'data', and produce the SAME loss trajectory as the single-device run at
equal global batch (GSPMD semantics are value-preserving; reduction-order
noise only). Runs on the 8-device virtual CPU mesh from tests/conftest.py.
"""
import numpy as np
import pytest

import jax

from multimodalrouting_tpu.models.full import CapsuleRoutingModel
from multimodalrouting_tpu.parallel.mesh import get_active_mesh
from multimodalrouting_tpu.train.loop import train_model
from tests.helpers import tiny_batch, tiny_config

pytestmark = pytest.mark.dist  # multi-device/multi-process tier (see pytest.ini)


def _run(n_data, n_model, epochs=2):
    cfg = tiny_config(
        **{
            "model.routes": "10",
            "model.num_classes": 2,
            "train.num_data_shards": n_data,
            "train.num_model_shards": n_model,
            "train.batch_size": 8,
            "train.epochs": epochs,
            "train.use_ema": False,
            "train.sampler_mode": "none",
            "train.route_dropout_p": 0.0,
        }
    )
    model = CapsuleRoutingModel(cfg=cfg)
    train_b = tiny_batch(n=16, seed=0)
    val_b = tiny_batch(n=8, seed=1)
    res = train_model(
        cfg, model, train_b, val_b, family="capsule", log_fn=lambda s: None
    )
    return res


@pytest.mark.slow  # two full (tiny) train runs; GSPMD compiles dominate
def test_sharded_matches_single_device_trajectory():
    assert len(jax.devices()) >= 8, "conftest should provision 8 virtual devices"
    single = _run(1, 1)
    sharded = _run(4, 2)
    assert get_active_mesh() is None, "active mesh must be cleared after training"
    for row_s, row_m in zip(single.history, sharded.history):
        # fp32 on CPU: only cross-device reduction order differs
        assert row_m["train_loss"] == pytest.approx(row_s["train_loss"], abs=2e-4)
        assert row_m["val_auroc"] == pytest.approx(row_s["val_auroc"], abs=2e-2)
    # params end up numerically close too
    p_s = jax.tree_util.tree_leaves(single.state.params)
    p_m = jax.tree_util.tree_leaves(sharded.state.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(p_s, p_m)
    )
    assert worst < 5e-3, f"param divergence {worst} between sharded/single runs"


def test_bad_shard_divisibility_raises():
    cfg = tiny_config(
        **{
            "train.num_data_shards": 3,
            "train.batch_size": 8,
            "train.epochs": 1,
        }
    )
    model = CapsuleRoutingModel(cfg=cfg)
    with pytest.raises(ValueError, match="divisible"):
        train_model(
            cfg, model, tiny_batch(n=8), tiny_batch(n=8),
            family="capsule", log_fn=lambda s: None,
        )


def test_cli_mesh_flag_parses_to_shard_config(monkeypatch, tmp_path):
    from multimodalrouting_tpu import cli

    seen = {}

    def fake_train_model(cfg, model, train_b, val_b, **kw):
        seen["shards"] = (cfg.train.num_data_shards, cfg.train.num_model_shards)
        raise SystemExit(0)  # stop before any real training

    monkeypatch.setattr("multimodalrouting_tpu.train.loop.train_model", fake_train_model)
    with pytest.raises(SystemExit):
        cli.main(
            [
                "train", "--family", "capsule", "--mesh", "data=4,model=2",
                "--epochs", "1", "--out", str(tmp_path),
                "--set", "data.synthetic_n=16",
            ]
        )
    assert seen["shards"] == (4, 2)


def test_cli_train_initializes_multihost_first(monkeypatch, tmp_path):
    """cmd_train must call init_multihost() before touching data/model so a
    pod launch sees all global devices (parallel/distributed.py shim)."""
    from multimodalrouting_tpu import cli

    calls = []

    def fake_init_multihost():
        calls.append("init")
        return False

    def fake_train_model(cfg, model, train_b, val_b, **kw):
        calls.append("train")
        raise SystemExit(0)

    monkeypatch.setattr(
        "multimodalrouting_tpu.parallel.distributed.init_multihost",
        fake_init_multihost,
    )
    monkeypatch.setattr("multimodalrouting_tpu.train.loop.train_model", fake_train_model)
    with pytest.raises(SystemExit):
        cli.main(
            [
                "train", "--family", "capsule", "--epochs", "1",
                "--out", str(tmp_path), "--set", "data.synthetic_n=16",
            ]
        )
    assert calls and calls[0] == "init", calls


@pytest.mark.slow
def test_checkpoint_roundtrip_under_mesh(tmp_path):
    """save_checkpoint on a 4x2-mesh (replicated/sharded) state gathers to
    host and restores bit-identical into a fresh single-device state."""
    from multimodalrouting_tpu.ckpt import restore_checkpoint, save_checkpoint
    from multimodalrouting_tpu.train.state import create_train_state

    cfg = tiny_config(
        **{
            "model.routes": "10",
            "model.num_classes": 2,
            "train.num_data_shards": 4,
            "train.num_model_shards": 2,
            "train.batch_size": 8,
            "train.epochs": 1,
            "train.use_ema": False,
            "train.sampler_mode": "none",
            "train.route_dropout_p": 0.0,
        }
    )
    model = CapsuleRoutingModel(cfg=cfg)
    train_b = tiny_batch(n=8, seed=0)
    res = train_model(
        cfg, model, train_b, tiny_batch(n=8, seed=1),
        family="capsule", log_fn=lambda s: None, ckpt_dir=str(tmp_path),
    )

    variables = model.init(jax.random.PRNGKey(7), train_b, train=False)
    fresh = create_train_state(cfg, model, variables)
    restored = restore_checkpoint(str(tmp_path), fresh, name="final")
    for a, b in zip(
        jax.tree_util.tree_leaves(res.state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(jax.device_get(restored.step)) == int(jax.device_get(res.state.step))

    # and the save itself from an explicitly sharded state (not just the
    # train_model internals) round-trips
    save_checkpoint(str(tmp_path), res.state, cfg, name="resave")
    again = restore_checkpoint(str(tmp_path), fresh, name="resave")
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(again.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
