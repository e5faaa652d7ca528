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
