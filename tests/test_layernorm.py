"""FastLayerNorm (ops/layernorm.py): fp32-stats / compute-dtype-affine LN.

Bounds the bf16-affine epilogue against flax's all-fp32 nn.LayerNorm chain
and proves the knob is checkpoint-compatible (identical param tree).
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodalrouting_tpu.ops.layernorm import FastLayerNorm, fast_layer_norm


def test_fast_layer_norm_fp32_exact():
    """At fp32 compute dtype the fast LN equals flax LayerNorm to float
    roundoff (same fast-variance formula)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 7, 64)).astype(np.float32)) * 3.0 + 0.5
    ln = nn.LayerNorm(epsilon=1e-12)
    v = ln.init(jax.random.PRNGKey(0), x)
    ref = ln.apply(v, x)
    got = fast_layer_norm(x, v["params"]["scale"], v["params"]["bias"], 1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_fast_layer_norm_bf16_tolerance():
    """bf16 compute: outputs are ~N(0,1) post-normalize, so the bf16-affine
    chain must stay within a couple of bf16 ulps (1/64 at |x|<=2) of the
    all-fp32 flax chain, including non-trivial scale/bias."""
    rng = np.random.default_rng(1)
    x32 = rng.normal(size=(8, 33, 768)).astype(np.float32) * 5.0 - 1.0
    x = jnp.asarray(x32, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(768,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(768,)).astype(np.float32) * 0.2)

    ref = nn.LayerNorm(epsilon=1e-12, dtype=jnp.bfloat16).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    got = fast_layer_norm(x, scale, bias, 1e-12)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=1.0 / 32, rtol=1.0 / 64,
    )


def test_fast_layer_norm_param_tree_matches_flax():
    """Same ('scale','bias') tree -> checkpoints/HF imports are
    knob-independent (encoder.bert_ln can flip on a saved run)."""
    x = jnp.ones((2, 5, 32), jnp.float32)
    v_fast = FastLayerNorm(epsilon=1e-12).init(jax.random.PRNGKey(0), x)
    v_flax = nn.LayerNorm(epsilon=1e-12).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_fast) == jax.tree_util.tree_structure(v_flax)
    for a, b in zip(jax.tree_util.tree_leaves(v_fast), jax.tree_util.tree_leaves(v_flax)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_bert_ln_knob_end_to_end():
    """encoder.bert_ln=bf16 builds, runs, and stays close to the fp32-LN
    encoder with IDENTICAL params (the knob changes no param tree)."""
    from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder

    rng = np.random.default_rng(2)
    b, s, length = 2, 2, 64
    notes = {
        "input_ids": jnp.asarray(rng.integers(0, 512, size=(b, s, length)), jnp.int32),
        "attention_mask": jnp.ones((b, s, length), jnp.int32),
        "chunk_mask": jnp.ones((b, s), jnp.float32),
    }
    kw = dict(d=32, vocab_size=512, hidden=64, layers=2, heads=2,
              intermediate=128, max_position=length, dtype=jnp.bfloat16)
    enc32 = BioClinBERTEncoder(ln="fp32", **kw)
    enc16 = BioClinBERTEncoder(ln="bf16", **kw)
    v = enc32.init(jax.random.PRNGKey(0), notes)
    _, _, pooled32 = enc32.apply(v, notes)
    _, _, pooled16 = enc16.apply(v, notes)  # same variables: tree-compatible
    a = np.asarray(pooled32, np.float32)
    g = np.asarray(pooled16, np.float32)
    np.testing.assert_allclose(g, a, atol=0.15, rtol=0.1)
