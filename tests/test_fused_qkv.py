"""Fused-QKV self-attention projection: one [D,3D] matmul vs three [D,D].

Must be output-identical and param-tree-identical to the unfused nn.Dense
path (checkpoints / HF imports are shared between the two layouts).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalrouting_tpu.models.attention import MultiheadAttention


def _mha(dtype=jnp.float32):
    return MultiheadAttention(d=32, num_heads=4, dtype=dtype)


def test_param_tree_identical(monkeypatch):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 32)), jnp.float32)
    monkeypatch.setenv("MMR_FUSED_QKV", "1")
    fused = _mha().init(jax.random.PRNGKey(0), x, x, x)["params"]
    monkeypatch.setenv("MMR_FUSED_QKV", "0")
    plain = _mha().init(jax.random.PRNGKey(0), x, x, x)["params"]
    assert jax.tree_util.tree_structure(fused) == jax.tree_util.tree_structure(plain)
    for (pf, lf), (pp, lp) in zip(
        jax.tree_util.tree_leaves_with_path(fused), jax.tree_util.tree_leaves_with_path(plain)
    ):
        assert pf == pp and lf.shape == lp.shape and lf.dtype == lp.dtype


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_self_attention_output_identical(monkeypatch, dtype):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 7, 32)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(3, 7)).astype(np.float32)).at[:, 0].set(1.0)
    monkeypatch.setenv("MMR_FUSED_QKV", "0")
    params = _mha(dtype).init(jax.random.PRNGKey(2), x, x, x)["params"]
    ref = _mha(dtype).apply({"params": params}, x, x, x, kv_mask=mask)
    monkeypatch.setenv("MMR_FUSED_QKV", "1")
    out = _mha(dtype).apply({"params": params}, x, x, x, kv_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0, atol=0
    )


def test_cross_attention_unaffected(monkeypatch):
    """q is not k -> the fused path must not engage (distinct kv projections)."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, 4, 32)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(2, 6, 32)), jnp.float32)
    monkeypatch.setenv("MMR_FUSED_QKV", "1")
    params = _mha().init(jax.random.PRNGKey(4), q, kv, kv)["params"]
    out = _mha().apply({"params": params}, q, kv, kv)
    monkeypatch.setenv("MMR_FUSED_QKV", "0")
    ref = _mha().apply({"params": params}, q, kv, kv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=0)


def test_grads_flow_through_fused(monkeypatch):
    monkeypatch.setenv("MMR_FUSED_QKV", "1")
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 5, 32)), jnp.float32)
    m = _mha()
    params = m.init(jax.random.PRNGKey(6), x, x, x)["params"]
    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x, x, x) ** 2))(params)
    norms = [float(jnp.linalg.norm(leaf)) for leaf in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms)) and all(n > 0 for n in norms)
