"""Orbax checkpoint backend (train.ckpt_backend=orbax|orbax_async).

The reference persists torch.save dicts (main.py:3336-3358); the msgpack
backend is this framework's portable equivalent. The orbax backends add the
TPU-production properties: per-shard writes by their owning hosts (no full
gather through one process) and background (async) saves. Checkpoints from
any backend restore through the same restore_checkpoint call (format
auto-detection), so resume is backend-agnostic.
"""
import os

import numpy as np
import pytest

from tests.helpers import tiny_batch, tiny_config

pytestmark = pytest.mark.slow


def _tiny_state():
    import jax

    from multimodalrouting_tpu.models.full import build_model
    from multimodalrouting_tpu.train.state import create_train_state

    cfg = tiny_config(**{"model.routes": "7", "model.num_classes": 2,
                         "train.use_ema": True})
    model = build_model(cfg, "capsule")
    batch = tiny_batch(n=4)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, create_train_state(cfg, model, variables)


def _leaves_equal(a, b):
    import jax

    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("backend", ["orbax", "orbax_async"])
def test_orbax_roundtrip_matches_msgpack(tmp_path, backend):
    from multimodalrouting_tpu.ckpt import (
        restore_checkpoint,
        save_checkpoint,
        wait_for_saves,
    )

    cfg, state = _tiny_state()
    save_checkpoint(str(tmp_path / "m"), state, cfg, name="last")
    save_checkpoint(str(tmp_path / "o"), state, cfg, name="last",
                    backend=backend, thresholds=np.array([0.4]))
    wait_for_saves()
    assert os.path.isdir(tmp_path / "o" / "last.orbax")
    assert os.path.exists(tmp_path / "o" / "last.meta.json")

    # fresh template (same shapes, different values) restores identically
    # through both formats — auto-detection, no backend arg on restore
    import jax

    _, fresh = _tiny_state()
    fresh = fresh.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0, fresh.params))
    r_msg = restore_checkpoint(str(tmp_path / "m"), fresh, name="last")
    r_orb = restore_checkpoint(str(tmp_path / "o"), fresh, name="last")
    _leaves_equal(r_msg.params, r_orb.params)
    _leaves_equal(r_msg.ema_params, r_orb.ema_params)
    _leaves_equal(r_msg.opt_state, r_orb.opt_state)
    assert int(r_orb.step) == int(state.step)

    # params_only (stage-chaining warm start) works from the orbax format too
    r_po = restore_checkpoint(str(tmp_path / "o"), fresh, name="last",
                              params_only=True)
    _leaves_equal(r_po.params, r_msg.params)

    # meta (config + thresholds) is backend-independent
    from multimodalrouting_tpu.ckpt import load_meta

    meta = load_meta(str(tmp_path / "o"), name="last")
    assert meta["thresholds"] == [0.4]


def test_orbax_async_overwrite_same_name(tmp_path):
    """Re-saving the same checkpoint name (per-epoch 'last') must wait out the
    in-flight write and replace the directory atomically enough to restore."""
    from multimodalrouting_tpu.ckpt import restore_checkpoint, save_checkpoint

    import jax

    cfg, state = _tiny_state()
    save_checkpoint(str(tmp_path), state, cfg, name="last", backend="orbax_async")
    bumped = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1, state.params))
    save_checkpoint(str(tmp_path), bumped, cfg, name="last", backend="orbax_async")
    restored = restore_checkpoint(str(tmp_path), state, name="last")
    _leaves_equal(restored.params, bumped.params)


def test_missing_checkpoint_raises(tmp_path):
    from multimodalrouting_tpu.ckpt import restore_checkpoint

    _, state = _tiny_state()
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path), state, name="nope")
