"""Route-level expert parallelism over the 'model' axis (parallel/ep.py).

`train.route_parallel=true` shards the stacked 6-stream MULT cross program
(models/mult.py `cross_streams`) on its leading stream axis — each model
shard holds and computes 6/n directional streams. GSPMD semantics are
value-preserving, so the EP loss trajectory must match the replicated run up
to reduction-order noise. Runs on the 8-device virtual CPU mesh.
"""
import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from multimodalrouting_tpu.models.full import CapsuleRoutingModel
from multimodalrouting_tpu.parallel.mesh import ep_enabled, get_active_mesh
from multimodalrouting_tpu.train.loop import train_model
from tests.helpers import tiny_batch, tiny_config

pytestmark = pytest.mark.dist  # multi-device/multi-process tier (see pytest.ini)


def _run(n_data, n_model, ep, epochs=2, **extra):
    cfg = tiny_config(
        **{
            "model.routes": "10",
            "model.num_classes": 2,
            "train.num_data_shards": n_data,
            "train.num_model_shards": n_model,
            "train.route_parallel": ep,
            "train.batch_size": 8,
            "train.epochs": epochs,
            "train.use_ema": False,
            "train.sampler_mode": "none",
            "train.route_dropout_p": 0.0,
            **extra,
        }
    )
    model = CapsuleRoutingModel(cfg=cfg)
    train_b = tiny_batch(n=16, seed=0)
    val_b = tiny_batch(n=8, seed=1)
    return train_model(
        cfg, model, train_b, val_b, family="capsule", log_fn=lambda s: None
    )


def test_ep_specs_shard_cross_streams_only():
    """Every leaf under the stacked cross-stream program gets its leading
    (stream) axis on 'model'; everything else stays replicated."""
    from multimodalrouting_tpu.parallel.ep import ep_spec_for_path

    cfg = tiny_config(**{"model.routes": "10", "model.num_classes": 2})
    model = CapsuleRoutingModel(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), tiny_batch(n=4), train=False)["params"]

    seen = {}

    def record(path, leaf):
        names = tuple(getattr(p, "key", str(p)) for p in path)
        seen["/".join(names)] = (ep_spec_for_path(path), leaf.shape)
        return leaf

    jax.tree_util.tree_map_with_path(record, params)

    cross = [k for k in seen if "cross_streams" in k]
    assert cross, f"no cross_streams params found in {list(seen)[:5]}"
    for k in cross:
        spec, shape = seen[k]
        assert spec == P("model"), k
        assert shape[0] == 6, f"{k}: stacked stream axis expected, got {shape}"
    for k, (spec, _) in seen.items():
        if "cross_streams" not in k:
            assert spec == P(), k


def test_ep_specs_cover_route_mult_directional():
    """The per-route MulT family's stacked 6-stream program
    (route_mult/directional) is shardable too; its 3-stream tri program
    (route_mult/LNI/streams) stays replicated."""
    from multimodalrouting_tpu.parallel.ep import ep_spec_for_path

    cfg = tiny_config(**{
        "model.routes": "10", "model.num_classes": 2,
        "model.bi_fusion_mode": "mult", "model.tri_fusion_mode": "mult",
    })
    model = CapsuleRoutingModel(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), tiny_batch(n=4), train=False)["params"]

    seen = {}

    def record(path, leaf):
        names = tuple(getattr(p, "key", str(p)) for p in path)
        seen["/".join(names)] = (ep_spec_for_path(path), leaf.shape)
        return leaf

    jax.tree_util.tree_map_with_path(record, params)

    directional = [k for k in seen if "route_mult/directional" in k]
    tri = [k for k in seen if "route_mult/LNI" in k]
    assert directional and tri, f"missing route_mult paths in {list(seen)[:5]}"
    for k in directional:
        spec, shape = seen[k]
        assert spec == P("model"), k
        assert shape[0] == 6, f"{k}: stacked stream axis expected, got {shape}"
    for k in tri:
        assert seen[k][0] == P(), k


@pytest.mark.slow  # two full (tiny) train runs; GSPMD compiles dominate
def test_ep_matches_replicated_trajectory():
    assert len(jax.devices()) >= 8, "conftest should provision 8 virtual devices"
    replicated = _run(4, 2, ep=False)
    ep = _run(4, 2, ep=True)
    assert get_active_mesh() is None and not ep_enabled(), "ep mode must clear"
    for row_r, row_e in zip(replicated.history, ep.history):
        assert row_e["train_loss"] == pytest.approx(row_r["train_loss"], abs=2e-4)
        assert row_e["val_auroc"] == pytest.approx(row_r["val_auroc"], abs=2e-2)
    p_r = jax.tree_util.tree_leaves(replicated.state.params)
    p_e = jax.tree_util.tree_leaves(ep.state.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(p_r, p_e)
    )
    assert worst < 5e-3, f"param divergence {worst} between EP/replicated runs"


@pytest.mark.slow
def test_ep_route_mult_matches_replicated_trajectory():
    """EP over the per-route MulT family (route_mult/directional)."""
    extra = {"model.bi_fusion_mode": "mult", "model.tri_fusion_mode": "mult"}
    replicated = _run(4, 2, ep=False, **extra)
    ep = _run(4, 2, ep=True, **extra)
    for row_r, row_e in zip(replicated.history, ep.history):
        assert row_e["train_loss"] == pytest.approx(row_r["train_loss"], abs=2e-4)
        assert row_e["val_auroc"] == pytest.approx(row_r["val_auroc"], abs=2e-2)


@pytest.mark.slow
def test_ep_state_actually_sharded():
    """The cross-stream weights must END the run sharded over 'model' —
    not silently re-replicated by GSPMD."""
    res = _run(2, 2, ep=True, epochs=1)
    flat = jax.tree_util.tree_flatten_with_path(res.state.params)[0]
    checked = 0
    for path, leaf in flat:
        names = [getattr(p, "key", str(p)) for p in path]
        if "cross_streams" in names and hasattr(leaf, "sharding"):
            spec = getattr(leaf.sharding, "spec", None)
            if spec is not None:
                assert "model" in str(spec), f"{names}: {spec}"
                checked += 1
    assert checked > 0, "no sharded cross-stream params found to check"


def test_ep_validation_rules():
    from multimodalrouting_tpu.parallel.ep import validate_ep

    base = {
        "model.routes": "10",
        "model.num_classes": 2,
        "train.route_parallel": True,
        "train.num_data_shards": 2,
        "train.num_model_shards": 2,
        "train.epochs": 1,
        "train.batch_size": 8,
    }
    # 6 streams over 4 shards does not divide
    with pytest.raises(ValueError, match="divisible"):
        validate_ep(tiny_config(**base), 4)
    # mutually exclusive with the other 'model'-axis weight-sharding roles
    with pytest.raises(ValueError, match="mutually exclusive"):
        validate_ep(tiny_config(**{**base, "train.tensor_parallel": True}), 2)
    # needs a 10-route fusion path (MULTRouter or per-route MulT)
    with pytest.raises(ValueError, match="routes=10"):
        validate_ep(tiny_config(**{**base, "model.routes": "7"}), 2)
    # both 10-route families are shardable
    validate_ep(tiny_config(**{**base, "model.bi_fusion_mode": "mult"}), 2)

    # end-to-end: train_model must reject and must not leak a mesh
    cfg = tiny_config(**{**base, "model.routes": "7"})
    model = CapsuleRoutingModel(cfg=cfg)
    with pytest.raises(ValueError, match="routes=10"):
        train_model(
            cfg, model, tiny_batch(n=8), tiny_batch(n=8),
            family="capsule", log_fn=lambda s: None,
        )
    assert get_active_mesh() is None
    assert not ep_enabled()
