"""Round-2 fixes: loss_based training gates, sigmoid-gate clamps, CheXpert
aux BCE, and tail-batch-complete evaluation."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multimodalrouting_tpu.data.batches import Batch
from multimodalrouting_tpu.models.full import CapsuleRoutingModel, GatedConcatModel
from multimodalrouting_tpu.train.state import create_train_state
from multimodalrouting_tpu.train.steps import make_eval_step, make_train_step

from helpers import tiny_batch, tiny_config
import pytest

pytestmark = pytest.mark.slow  # full train/eval step compiles


def _as_jnp(batch):
    return jax.tree_util.tree_map(jnp.asarray, batch)


class TestLossBasedTraining:
    def test_train_step_runs_and_gates_respond(self):
        """gate_mode=loss_based now trains end-to-end: the model computes
        per-route BCE from its own route logits every step (reference
        train_step3_trimodal_router.py:377-394)."""
        cfg = tiny_config(**{
            "model.gate_mode": "loss_based",
            "model.num_classes": 1,
            "train.encoder_warmup_epochs": 0,
        })
        model = GatedConcatModel(cfg=cfg)
        batch = _as_jnp(tiny_batch(4))
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)

        # forward computes internal loss-based gates without external losses
        out = model.apply(variables, batch, train=False)
        assert out.gates.shape == (4, 7)
        np.testing.assert_allclose(np.asarray(out.gates).sum(axis=1), 1.0, atol=1e-5)

        # gates respond to route losses: a route with a huge externally-fed
        # loss must get (near-)zero gate weight
        fed = jnp.zeros((4, 7)).at[:, 2].set(50.0)
        out_fed = model.apply(variables, batch, train=False, route_losses=fed)
        gates = np.asarray(out_fed.gates)
        assert gates[:, 2].max() < 1e-6
        np.testing.assert_allclose(gates.sum(axis=1), 1.0, atol=1e-5)

        # one full train step: finite loss, step increments
        state = create_train_state(cfg, model, variables)
        step = make_train_step(cfg, model, "gated_concat")
        new_state, metrics = step(
            state, batch, jax.random.PRNGKey(1), jnp.asarray(1e-3), jnp.asarray(1e-3)
        )
        assert np.isfinite(float(metrics.loss))
        assert int(new_state.step) == 1
        assert bool(metrics.grad_finite)


class TestGateClampKnobs:
    def test_clamps_reach_capsule_routing(self):
        """model.gate_temp/gate_min/gate_max thread config -> CapsuleHead ->
        capsule_routing (reference capsule_atten.py:107-124)."""
        from multimodalrouting_tpu.routing.capsule_head import CapsuleHead

        rng = np.random.default_rng(0)
        poses = jnp.asarray(rng.standard_normal((3, 7, 8)), jnp.float32)
        priors = jnp.asarray(rng.random((3, 7, 1)), jnp.float32)

        def run(**kw):
            head = CapsuleHead(
                num_routes=7, pc_dim=8, mc_caps_dim=16, num_classes=2,
                num_routing=3, head_style="class_embed",
                routing_mode="sigmoid_routes", **kw,
            )
            v = head.init(jax.random.PRNGKey(0), poses, priors)
            # nonzero class embedding so logits reflect routing differences
            emb = jax.random.normal(jax.random.PRNGKey(1), v["params"]["embedding"].shape)
            v = {"params": {**v["params"], "embedding": emb}}
            return head.apply(v, poses, priors)

        base = run()
        clamped = run(gate_temp=3.0, gate_min=0.2, gate_max=0.8)
        assert not np.allclose(np.asarray(base.logits), np.asarray(clamped.logits))

    def test_config_knob_reaches_model(self):
        cfg = tiny_config(**{
            "model.capsule_act_type": "sigmoid_gate",
            "model.gate_temp": 2.0,
            "model.gate_min": 0.1,
            "model.gate_max": 0.9,
        })
        model = CapsuleRoutingModel(cfg=cfg)
        batch = _as_jnp(tiny_batch(2))
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(variables, batch, train=False)
        assert np.all(np.isfinite(np.asarray(out.logits)))


class TestChexpertAux:
    def test_aux_bce_changes_loss(self):
        cfg0 = tiny_config(**{"train.encoder_warmup_epochs": 0})
        cfg1 = tiny_config(**{
            "train.encoder_warmup_epochs": 0,
            "train.chexpert_weight": 0.5,
        })
        model = CapsuleRoutingModel(cfg=cfg0)
        batch = _as_jnp(tiny_batch(4))
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)

        losses = {}
        for name, cfg in (("off", cfg0), ("on", cfg1)):
            # fresh buffers per run: the jitted train step donates the state
            fresh = jax.tree_util.tree_map(jnp.copy, variables)
            state = create_train_state(cfg, model, fresh)
            step = make_train_step(cfg, model, "capsule")
            _, metrics = step(
                state, batch, jax.random.PRNGKey(1), jnp.asarray(1e-3), jnp.asarray(1e-3)
            )
            losses[name] = float(metrics.loss)
        assert np.isfinite(losses["on"]) and np.isfinite(losses["off"])
        assert losses["on"] != losses["off"]


class TestEvalTailBatch:
    def test_predict_probs_covers_all_samples(self):
        """n % batch_size != 0 must not drop the tail (train/loop.py fix)."""
        from multimodalrouting_tpu.train.loop import _predict_probs

        cfg = tiny_config()
        model = CapsuleRoutingModel(cfg=cfg)
        cohort = _as_jnp(tiny_batch(10))
        variables = model.init(jax.random.PRNGKey(0), cohort, train=False)
        state = create_train_state(cfg, model, variables)
        eval_step = make_eval_step(cfg, model, "capsule", use_ema=False)

        probs4, alpha4, rm4 = _predict_probs(eval_step, state, cohort, 4, "mort")
        assert probs4.shape[0] == 10
        assert alpha4.shape[0] == 10 and rm4.shape[0] == 10

        probs10, _, _ = _predict_probs(eval_step, state, cohort, 10, "mort")
        np.testing.assert_allclose(probs4, probs10, rtol=1e-5, atol=1e-6)


def test_gated_staged_logits_use_stage_route_heads():
    """step1/step2 monitor + loss come from the stage's route heads, not the
    frozen final head (reference train_step1:299-309, train_step2:317)."""
    cfg = tiny_config(**{"model.num_classes": 1})
    batch = _as_jnp(tiny_batch())
    from multimodalrouting_tpu.models.full import build_model

    model = build_model(cfg, "gated_concat")
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    out3 = model.apply(variables, batch, train=False)
    out1 = model.apply(variables, batch, train=False, stage="step1")
    out2 = model.apply(variables, batch, train=False, stage="step2")

    np.testing.assert_allclose(
        np.asarray(out1.logits), np.asarray(out1.route_logits[:, :3].mean(1)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out2.logits), np.asarray(out2.route_logits[:, 3:6].mean(1)), rtol=1e-6
    )
    # full/step3 logits come from the final head instead
    assert not np.allclose(np.asarray(out3.logits), np.asarray(out1.logits))
