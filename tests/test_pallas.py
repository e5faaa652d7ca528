"""Pallas capsule kernel vs the XLA reference (interpret mode on CPU).

The production attention fast path is the tuned upstream flash-attention
kernel (ops/flash.py); the hand-rolled Pallas attention core it replaced was
deleted in round 2 (it only reached parity with fused XLA — see PERF.md).
"""
import jax
import jax.numpy as jnp
import numpy as np

from multimodalrouting_tpu.ops.capsule import capsule_routing, capsule_weight_init
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


def test_splash_self_attention_matches_xla(monkeypatch):
    """ops/flash.py splash variant == masked XLA softmax attention on valid
    query rows (pad-query rows are garbage by contract, masked downstream)."""
    monkeypatch.setenv("MMR_SPLASH_INTERPRET", "1")
    from multimodalrouting_tpu.ops.flash import splash_self_attention

    rng = np.random.default_rng(2)
    b, t, h, dh = 2, 256, 2, 64
    q = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32)) * dh**-0.5
    k = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    valid = np.ones((b, t), np.float32)
    valid[0, 200:] = 0.0  # ragged pad tail
    kv_mask = jnp.asarray(valid)

    got = np.asarray(splash_self_attention(q, k, v, kv_mask))

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    logits = jnp.where(kv_mask.astype(bool)[:, None, None, :], logits, -1e30)
    ref = np.asarray(
        jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, axis=-1), v)
    )
    m = valid.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], rtol=2e-4, atol=2e-5)
