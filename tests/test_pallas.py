"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodalrouting_tpu.ops.capsule import capsule_routing, capsule_weight_init
from multimodalrouting_tpu.ops.pallas_attention import (
    _xla_attention,
    masked_attention_pallas,
    multihead_attention_core,
)
from multimodalrouting_tpu.ops.pallas_capsule import capsule_routing_pallas
import pytest

pytestmark = pytest.mark.slow  # pallas interpret-mode kernels


def test_pallas_capsule_matches_xla():
    rng = np.random.default_rng(0)
    b, n, a, m, d = 8, 10, 32, 25, 64
    pose = jnp.asarray(rng.normal(size=(b, n, a)).astype(np.float32))
    act = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, n)).astype(np.float32))
    w = capsule_weight_init(jax.random.PRNGKey(0), n, a, m, d)

    ref = capsule_routing(pose, act, w, 3)
    got_pose, got_act, got_coef = capsule_routing_pallas(pose, act, w, 3, True)
    np.testing.assert_allclose(np.asarray(got_pose), np.asarray(ref.pose), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_act), np.asarray(ref.act), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_coef), np.asarray(ref.coef), rtol=1e-5, atol=1e-6)


def test_pallas_capsule_grad_matches_xla():
    rng = np.random.default_rng(1)
    b, n, a, m, d = 4, 7, 16, 2, 32
    pose = jnp.asarray(rng.normal(size=(b, n, a)).astype(np.float32))
    act = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, n)).astype(np.float32))
    w = capsule_weight_init(jax.random.PRNGKey(1), n, a, m, d)

    def loss_pallas(w_):
        p, _, c = capsule_routing_pallas(pose, act, w_, 3, True)
        return jnp.sum(p**2) + jnp.sum(c * c)

    def loss_xla(w_):
        out = capsule_routing(pose, act, w_, 3)
        return jnp.sum(out.pose**2) + jnp.sum(out.coef * out.coef)

    g_pallas = jax.grad(loss_pallas)(w)
    g_xla = jax.grad(loss_xla)(w)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-5)


def test_pallas_attention_matches_xla():
    rng = np.random.default_rng(2)
    g, tq, tk, dh = 6, 16, 24, 32
    q = jnp.asarray(rng.normal(size=(g, tq, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(g, tk, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(g, tk, dh)).astype(np.float32))
    mask = jnp.asarray((rng.random((g, tk)) > 0.3).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)  # at least one valid key

    got = masked_attention_pallas(q, k, v, mask, 0.25, True)
    ref = _xla_attention(q, k, v, mask, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_multihead_core_and_grads():
    rng = np.random.default_rng(3)
    b, t, h, dh = 2, 8, 4, 16
    q = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    mask = jnp.ones((b, t))

    out_pl = multihead_attention_core(q, k, v, mask, 0.25, use_pallas=True)
    out_xla = multihead_attention_core(q, k, v, mask, 0.25, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla), rtol=1e-5, atol=1e-6)

    g = jax.grad(lambda q_: jnp.sum(multihead_attention_core(q_, k, v, mask, 0.25, True) ** 2))(q)
    g2 = jax.grad(lambda q_: jnp.sum(multihead_attention_core(q_, k, v, mask, 0.25, False) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-4, atol=1e-5)
