"""Tensor parallelism over the 'model' axis (parallel/tp.py).

`train.tensor_parallel=true` shards the text-encoder transformer weights
Megatron-style (column-parallel q/k/v + FFN-in, row-parallel out_proj +
FFN-out) instead of the note-chunk axis. GSPMD semantics are
value-preserving, so the TP loss trajectory must match the replicated run
up to reduction-order noise. Runs on the 8-device virtual CPU mesh.
"""
import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from multimodalrouting_tpu.models.full import CapsuleRoutingModel
from multimodalrouting_tpu.parallel.mesh import get_active_mesh, tp_enabled
from multimodalrouting_tpu.train.loop import train_model
from tests.helpers import tiny_batch, tiny_config

pytestmark = pytest.mark.dist  # multi-device/multi-process tier (see pytest.ini)


def _run(n_data, n_model, tp, epochs=2):
    cfg = tiny_config(
        **{
            "model.routes": "10",
            "model.num_classes": 2,
            "train.num_data_shards": n_data,
            "train.num_model_shards": n_model,
            "train.tensor_parallel": tp,
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
    return train_model(
        cfg, model, train_b, val_b, family="capsule", log_fn=lambda s: None
    )


def test_tp_specs_follow_megatron_pattern():
    """q/k/v + FFN-in column-parallel, out_proj + FFN-out row-parallel,
    embeddings/LayerNorms/other modules replicated."""
    from multimodalrouting_tpu.parallel.tp import tp_spec_for_path

    cfg = tiny_config()
    model = CapsuleRoutingModel(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), tiny_batch(n=4), train=False)["params"]

    seen = {}

    def record(path, leaf):
        names = tuple(getattr(p, "key", str(p)) for p in path)
        seen["/".join(names)] = tp_spec_for_path(path)
        return leaf

    jax.tree_util.tree_map_with_path(record, params)

    col = [k for k in seen if "bert" in k and k.endswith("q_proj/kernel")]
    row = [k for k in seen if "bert" in k and k.endswith("out_proj/kernel")]
    ffn_in = [k for k in seen if "bert" in k and k.endswith("intermediate/kernel")]
    ffn_out = [k for k in seen if "bert" in k and "layer_" in k and k.endswith("output/kernel")]
    assert col and row and ffn_in and ffn_out, f"missing BERT paths in {list(seen)[:5]}"
    for k in col + ffn_in:
        assert seen[k] == P(None, "model"), k
        assert seen[k.replace("kernel", "bias")] == P("model"), k
    for k in row + ffn_out:
        assert seen[k] == P("model", None), k
        assert seen[k.replace("kernel", "bias")] == P(), k
    # everything outside the BERT layers is replicated
    for k, spec in seen.items():
        if "bert" not in k or "layer_" not in k:
            assert spec == P(), k
    # LayerNorms inside the layers too
    for k, spec in seen.items():
        if "bert" in k and "/ln/" in k:
            assert spec == P(), k


@pytest.mark.slow  # two full (tiny) train runs; GSPMD compiles dominate
def test_tp_matches_replicated_trajectory():
    assert len(jax.devices()) >= 8, "conftest should provision 8 virtual devices"
    replicated = _run(4, 2, tp=False)
    tp = _run(4, 2, tp=True)
    assert get_active_mesh() is None and not tp_enabled(), "tp mode must clear"
    for row_r, row_t in zip(replicated.history, tp.history):
        assert row_t["train_loss"] == pytest.approx(row_r["train_loss"], abs=2e-4)
        assert row_t["val_auroc"] == pytest.approx(row_r["val_auroc"], abs=2e-2)
    p_r = jax.tree_util.tree_leaves(replicated.state.params)
    p_t = jax.tree_util.tree_leaves(tp.state.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(p_r, p_t)
    )
    assert worst < 5e-3, f"param divergence {worst} between TP/replicated runs"


@pytest.mark.slow
def test_tp_state_actually_sharded():
    """The BERT layer weights must END the run sharded over 'model' —
    not silently re-replicated by GSPMD."""
    res = _run(2, 2, tp=True, epochs=1)
    flat = jax.tree_util.tree_flatten_with_path(res.state.params)[0]
    checked = 0
    for path, leaf in flat:
        names = [getattr(p, "key", str(p)) for p in path]
        if (
            "bert" in names
            and len(names) >= 2
            and names[-1] == "kernel"
            and names[-2] in ("q_proj", "intermediate")
            and hasattr(leaf, "sharding")
        ):
            spec = getattr(leaf.sharding, "spec", None)
            if spec is not None:
                assert "model" in str(spec), f"{names}: {spec}"
                checked += 1
    assert checked > 0, "no sharded BERT kernels found to check"


def test_tp_divisibility_validation():
    cfg = tiny_config(
        **{
            "encoder.bert_heads": 3,  # not divisible by 2 model shards
            "train.num_data_shards": 2,
            "train.num_model_shards": 2,
            "train.tensor_parallel": True,
            "train.epochs": 1,
            "train.batch_size": 8,
        }
    )
    model = CapsuleRoutingModel(cfg=cfg)
    with pytest.raises(ValueError, match="divisible"):
        train_model(
            cfg, model, tiny_batch(n=8), tiny_batch(n=8),
            family="capsule", log_fn=lambda s: None,
        )
    # the raise must not leak global mesh/tp state into later runs in the
    # same process (it fires before any global is published, and the
    # finally clears whatever was)
    assert get_active_mesh() is None
    assert not tp_enabled()
