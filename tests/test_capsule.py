"""Golden-value tests for capsule routing numerics.

An independent NumPy oracle implements the routing-by-agreement formulas
(agreement einsum -> softmax over decision capsules -> act weighting ->
renorm -> vote aggregation, with the uniform first-iteration seed) exactly as
specified by the reference semantics (capsule_layers.py:52-124), and the JAX
kernel must match it at fp32 to tight tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalrouting_tpu.ops.capsule import (
    CapsuleOut,
    capsule_routing,
    capsule_weight_init,
    route_given_label,
)


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def numpy_capsule_oracle(pose, act, w, num_iters, mode="softmax_out", act_type="ONES"):
    """Independent fp64 implementation of the routing recurrence."""
    pose = pose.astype(np.float64)
    act = act.astype(np.float64)
    w = w.astype(np.float64)
    n, a, m, d = w.shape
    b = pose.shape[0]
    scale = 1.0 / np.sqrt(d)

    if mode == "sigmoid_routes":
        seed = np.full((n, m), 1.0 / n)
        eps = 1e-6
        act = np.clip(act, eps, 1 - eps)  # gate clamp (temp=1, no min/max)
    else:
        seed = np.full((n, m), 1.0 / m)

    next_pose = np.einsum("nm,bna,namd->bmd", seed, pose, w)
    next_act = np.broadcast_to(act.mean(axis=1, keepdims=True), (b, m)).copy()
    coef = np.broadcast_to(seed[None], (b, n, m)).copy()

    for _ in range(num_iters):
        agree = np.einsum("bna,namd,bmd->bnm", pose, w, next_pose) * scale
        if mode == "sigmoid_routes":
            qk = np.clip(1.0 / (1.0 + np.exp(-agree)), 1e-6, 1 - 1e-6)
            coef = qk / np.clip(qk.sum(axis=1, keepdims=True), 1e-6, None)
        else:
            qk = _softmax(agree, axis=2)
            qk = qk * next_act[:, None, :]
            coef = qk / (qk.sum(axis=2, keepdims=True) + 1e-10)
        next_pose = np.einsum("bnm,bna,namd,bn->bmd", coef, pose, w, act)
        if act_type == "ONES":
            next_act = np.ones((b, m))
    return next_pose, next_act, coef


@pytest.mark.parametrize("mode", ["softmax_out", "sigmoid_routes"])
@pytest.mark.parametrize("num_iters", [1, 3])
def test_capsule_matches_oracle(mode, num_iters):
    rng = np.random.default_rng(7)
    b, n, a, m, d = 4, 10, 32, 25, 64
    pose = rng.normal(size=(b, n, a)).astype(np.float32)
    act = rng.uniform(0.05, 0.95, size=(b, n)).astype(np.float32)
    w = np.asarray(capsule_weight_init(jax.random.PRNGKey(0), n, a, m, d))

    out = capsule_routing(jnp.asarray(pose), jnp.asarray(act), jnp.asarray(w), num_iters, mode=mode)
    exp_pose, exp_act, exp_coef = numpy_capsule_oracle(pose, act, w, num_iters, mode=mode)

    np.testing.assert_allclose(np.asarray(out.pose), exp_pose, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.act), exp_act, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.coef), exp_coef, rtol=2e-4, atol=2e-5)


def test_capsule_coef_is_stochastic_over_classes():
    rng = np.random.default_rng(1)
    b, n, a, m, d = 2, 7, 16, 2, 32
    pose = rng.normal(size=(b, n, a)).astype(np.float32)
    act = np.ones((b, n), np.float32)
    w = np.asarray(capsule_weight_init(jax.random.PRNGKey(1), n, a, m, d))
    out = capsule_routing(jnp.asarray(pose), jnp.asarray(act), jnp.asarray(w), 3)
    sums = np.asarray(out.coef).sum(axis=2)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_uniform_routing():
    rng = np.random.default_rng(2)
    pose = jnp.asarray(rng.normal(size=(3, 7, 8)).astype(np.float32))
    act = jnp.ones((3, 7))
    w = capsule_weight_init(jax.random.PRNGKey(2), 7, 8, 4, 8)
    out = capsule_routing(pose, act, w, 3, uniform_routing=True)
    np.testing.assert_allclose(np.asarray(out.coef), 0.25, rtol=1e-6)


def test_route_given_label_normalizes_over_routes_and_respects_mask():
    rng = np.random.default_rng(3)
    coef = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, 7, 5)).astype(np.float32))
    mask = jnp.array([[1, 1, 1, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1]], dtype=jnp.float32)
    r = route_given_label(coef, route_mask=mask)
    r_np = np.asarray(r)
    np.testing.assert_allclose(r_np.sum(axis=1), 1.0, rtol=1e-5)
    assert np.all(r_np[0, 3:] == 0.0)


def test_capsule_jit_and_grad():
    rng = np.random.default_rng(4)
    pose = jnp.asarray(rng.normal(size=(2, 10, 16)).astype(np.float32))
    act = jnp.asarray(rng.uniform(0.2, 0.8, size=(2, 10)).astype(np.float32))
    w = capsule_weight_init(jax.random.PRNGKey(4), 10, 16, 25, 32)

    @jax.jit
    def loss(w_, p_, a_):
        out = capsule_routing(p_, a_, w_, 3)
        return jnp.sum(out.pose**2) + jnp.sum(out.coef)

    g = jax.grad(loss)(w, pose, act)
    assert g.shape == w.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_assert_routing_over_routes():
    from multimodalrouting_tpu.ops.capsule import assert_routing_over_routes

    rng = np.random.default_rng(5)
    r = jnp.asarray(rng.uniform(0.1, 1.0, (2, 7, 3)).astype(np.float32))
    r = r / r.sum(axis=1, keepdims=True)
    assert_routing_over_routes(r)
    with pytest.raises(AssertionError):
        assert_routing_over_routes(r * 2.0)


def test_coerce_rc_semantics():
    from multimodalrouting_tpu.ops.capsule import coerce_rc_semantics

    rng = np.random.default_rng(6)
    r = jnp.asarray(rng.uniform(0.1, 1.0, (2, 7, 3)).astype(np.float32))
    r = r / r.sum(axis=1, keepdims=True)  # [B, R, K] normalized over routes
    # correct orientation untouched
    np.testing.assert_array_equal(np.asarray(coerce_rc_semantics(r, 7)), np.asarray(r))
    # transposed input gets fixed back
    fixed = coerce_rc_semantics(jnp.swapaxes(r, 1, 2), 7)
    np.testing.assert_allclose(np.asarray(fixed), np.asarray(r), rtol=1e-6)
    # ambiguous square case resolved by normalization axis
    sq = jnp.asarray(rng.uniform(0.1, 1.0, (2, 4, 4)).astype(np.float32))
    sq = sq / sq.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(coerce_rc_semantics(jnp.swapaxes(sq, 1, 2), 4)), np.asarray(sq), rtol=1e-5
    )


def test_decision_pose_dropout_semantics():
    """Train-only decision-pose dropout (reference capsule_layers.py:118).

    Inverted-dropout contract per iteration: kept coords scale by 1/keep_p,
    dropped coords are exactly zero — checked at num_iters=1 where the output
    pose is the dropped sample itself.
    """
    import jax

    from multimodalrouting_tpu.ops.capsule import capsule_routing

    rng = np.random.default_rng(11)
    pose = jnp.asarray(rng.normal(size=(3, 7, 8)).astype(np.float32))
    act = jnp.asarray(rng.uniform(0.2, 0.9, (3, 7)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 8, 2, 16)).astype(np.float32) * 0.1)

    clean = capsule_routing(pose, act, w, 1)
    key = jax.random.PRNGKey(0)
    dropped = capsule_routing(pose, act, w, 1, dropout_rate=0.5, dropout_rng=key)

    p_clean = np.asarray(clean.pose)
    p_drop = np.asarray(dropped.pose)
    zero = p_drop == 0.0
    assert 0.2 < zero.mean() < 0.8  # ~half dropped
    np.testing.assert_allclose(p_drop[~zero], 2.0 * p_clean[~zero], rtol=1e-6)
    # eval path (no rng) is exactly the clean program regardless of the rate
    eval_out = capsule_routing(pose, act, w, 1, dropout_rate=0.5, dropout_rng=None)
    np.testing.assert_array_equal(np.asarray(eval_out.pose), p_clean)


def test_dropout_feeds_next_iteration_agreement():
    """With >1 iteration the dropped pose must drive the next agreement —
    i.e. the coefficients change too, not just the final pose (the reference
    drops inside every forward call of the routing loop)."""
    import jax

    from multimodalrouting_tpu.ops.capsule import capsule_routing

    rng = np.random.default_rng(12)
    pose = jnp.asarray(rng.normal(size=(2, 7, 8)).astype(np.float32))
    act = jnp.asarray(rng.uniform(0.2, 0.9, (2, 7)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 8, 2, 16)).astype(np.float32))

    clean = capsule_routing(pose, act, w, 3)
    dropped = capsule_routing(
        pose, act, w, 3, dropout_rate=0.3, dropout_rng=jax.random.PRNGKey(7)
    )
    assert np.abs(np.asarray(clean.coef) - np.asarray(dropped.coef)).max() > 1e-6
    # same rng -> same draw (pure function of the key)
    again = capsule_routing(
        pose, act, w, 3, dropout_rate=0.3, dropout_rng=jax.random.PRNGKey(7)
    )
    np.testing.assert_array_equal(np.asarray(again.pose), np.asarray(dropped.pose))


def test_capsule_head_dropout_train_vs_eval():
    """model.capsule_dropout is live: train-mode forward with the knob set
    differs across dropout rngs; eval is unchanged from the rate-0 head."""
    import jax

    from multimodalrouting_tpu.routing.capsule_head import CapsuleHead

    rng = np.random.default_rng(13)
    poses = jnp.asarray(rng.normal(size=(2, 7, 8)).astype(np.float32))
    priors = jnp.asarray(rng.uniform(0.1, 0.9, (2, 7, 1)).astype(np.float32))

    head = CapsuleHead(
        num_routes=7, pc_dim=8, mc_caps_dim=16, num_classes=2,
        head_style="class_linear", dropout_rate=0.5,
    )
    params = head.init(jax.random.PRNGKey(0), poses, priors)
    out_eval = head.apply(params, poses, priors)  # deterministic default

    head0 = CapsuleHead(
        num_routes=7, pc_dim=8, mc_caps_dim=16, num_classes=2,
        head_style="class_linear", dropout_rate=0.0,
    )
    out_rate0 = head0.apply(params, poses, priors)
    np.testing.assert_array_equal(np.asarray(out_eval.logits), np.asarray(out_rate0.logits))

    t1 = head.apply(
        params, poses, priors, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    t2 = head.apply(
        params, poses, priors, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert np.abs(np.asarray(t1.logits) - np.asarray(t2.logits)).max() > 1e-6
