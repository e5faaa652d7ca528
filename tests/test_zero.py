"""ZeRO-1 optimizer-state sharding (parallel/zero.py).

`train.zero_sharded_opt=true` shards Adam moment tensors' leading dim over
'data'. Value-preserving (update math unchanged), so the trajectory must
match the replicated layout; the moments must also STAY sharded across
steps (GSPMD must not re-replicate them on the first update).
Runs on the 8-device virtual CPU mesh from tests/conftest.py.
"""
import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from multimodalrouting_tpu.models.full import CapsuleRoutingModel
from multimodalrouting_tpu.train.loop import train_model
from tests.helpers import tiny_batch, tiny_config

pytestmark = pytest.mark.dist  # multi-device/multi-process tier (see pytest.ini)


def _run(zero, epochs=2, finetune_text=True):
    cfg = tiny_config(
        **{
            "model.routes": "10",
            "model.num_classes": 2,
            "encoder.finetune_text": finetune_text,  # BERT moments exist
            "train.num_data_shards": 4,
            "train.num_model_shards": 1,
            "train.zero_sharded_opt": zero,
            "train.batch_size": 8,
            "train.epochs": epochs,
            "train.use_ema": False,
            "train.sampler_mode": "none",
            "train.route_dropout_p": 0.0,
        }
    )
    model = CapsuleRoutingModel(cfg=cfg)
    return train_model(
        cfg, model, tiny_batch(n=16, seed=0), tiny_batch(n=8, seed=1),
        family="capsule", log_fn=lambda s: None,
    )


def test_zero_spec_rules():
    """Leading-dim-divisible big tensors shard; scalars/small/indivisible
    leaves stay replicated."""
    from multimodalrouting_tpu.parallel.mesh import make_mesh
    from multimodalrouting_tpu.parallel.zero import zero_opt_shardings

    mesh = make_mesh(n_data=4, n_model=2)
    fake = {
        "mu": np.zeros((1024, 8), np.float32),      # divisible + big -> sharded
        "small_bias": np.zeros((64,), np.float32),  # below MIN_SHARD_SIZE
        "odd": np.zeros((1023, 8), np.float32),     # not divisible by 4
        "count": np.zeros((), np.int32),            # scalar
    }
    sh = zero_opt_shardings(fake, mesh)
    assert sh["mu"].spec == P("data")
    assert sh["small_bias"].spec == P()
    assert sh["odd"].spec == P()
    assert sh["count"].spec == P()


@pytest.mark.slow  # two full (tiny) train runs
def test_zero_matches_replicated_trajectory_and_stays_sharded():
    assert len(jax.devices()) >= 8, "conftest should provision 8 virtual devices"
    base = _run(zero=False)
    zero = _run(zero=True)
    for row_b, row_z in zip(base.history, zero.history):
        assert row_z["train_loss"] == pytest.approx(row_b["train_loss"], abs=2e-4)
    p_b = jax.tree_util.tree_leaves(base.state.params)
    p_z = jax.tree_util.tree_leaves(zero.state.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(p_b, p_z)
    )
    assert worst < 5e-3, f"param divergence {worst} between ZeRO/replicated runs"

    # after 2 epochs of updates the big moments must still be data-sharded
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(zero.state.opt_state):
        sh = getattr(leaf, "sharding", None)
        spec = getattr(sh, "spec", None)
        if spec is not None and "data" in str(spec):
            sharded += 1
    assert sharded > 0, "no opt-state leaf remained sharded after training"
