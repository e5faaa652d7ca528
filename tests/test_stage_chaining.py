"""3-stage curriculum chaining via CLI --init-from + fairness loss wiring."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_batch, tiny_config
from tests.test_cli_and_baselines import _sets
import pytest

pytestmark = pytest.mark.slow  # multi-stage CLI runs


def test_stepwise_chaining(tmp_path, capsys):
    from multimodalrouting_tpu.cli import main

    s1 = str(tmp_path / "s1")
    s2 = str(tmp_path / "s2")
    rc = main(
        ["train", "--family", "gated_concat", "--task", "mort", "--stage", "step1",
         "--epochs", "1", "--out", s1] + _sets()
    )
    assert rc == 0
    capsys.readouterr()
    rc = main(
        ["train", "--family", "gated_concat", "--task", "mort", "--stage", "step2",
         "--epochs", "1", "--out", s2, "--init-from", s1] + _sets()
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["stage"] == "step2"
    assert os.path.exists(os.path.join(s2, "final.msgpack"))


def test_params_only_restore(tmp_path):
    from multimodalrouting_tpu.ckpt import restore_checkpoint, save_checkpoint
    from multimodalrouting_tpu.models.full import build_model
    from multimodalrouting_tpu.train.state import create_train_state

    cfg = tiny_config(**{"model.num_classes": 1})
    batch = tiny_batch()
    model = build_model(cfg, "gated_concat")
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = create_train_state(cfg, model, variables)
    state = state.replace(step=jnp.asarray(77))
    save_checkpoint(str(tmp_path), state, cfg, name="x")

    fresh = create_train_state(cfg, model, model.init(jax.random.PRNGKey(1), batch, train=False))
    restored = restore_checkpoint(str(tmp_path), fresh, name="x", params_only=True)
    assert int(restored.step) == 0  # fresh optimizer/step
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fairness_loss_wired():
    from multimodalrouting_tpu.models.full import build_model
    from multimodalrouting_tpu.train.state import create_train_state
    from multimodalrouting_tpu.train.steps import make_train_step

    cfg = tiny_config(**{"model.num_classes": 1, "train.fairness_gamma": 0.5})
    batch = tiny_batch(n=8)
    model = build_model(cfg, "gated_concat")
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, "gated_concat")
    _, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.asarray(1e-3), jnp.asarray(1e-3))
    assert float(metrics.reg_loss) >= 0.0
    assert np.isfinite(float(metrics.reg_loss))


def test_full_resume_continues_epochs(tmp_path, capsys):
    from multimodalrouting_tpu.cli import main

    out = str(tmp_path / "r1")
    rc = main(
        ["train", "--family", "capsule", "--task", "mort", "--routes", "10",
         "--epochs", "2", "--out", out] + _sets()
    )
    assert rc == 0
    capsys.readouterr()
    # resume with a larger epoch budget: only the remaining epochs run
    rc = main(
        ["train", "--family", "capsule", "--task", "mort", "--routes", "10",
         "--epochs", "3", "--out", out, "--resume", out] + _sets()
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["epochs_ran"] == 1, summary
