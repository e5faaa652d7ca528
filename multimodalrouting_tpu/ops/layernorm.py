"""bf16-affine LayerNorm: fp32 statistics, compute-dtype normalize+affine.

Why: flax's nn.LayerNorm promotes the WHOLE normalize+affine chain to fp32
(x - mean, *rsqrt, *scale, +bias all run fp32, then one cast down), because
mean/var are computed at fp32 — with bf16 compute that makes every LN
epilogue an fp32 elementwise island inside an otherwise-bf16 fusion
(PERF.md round-3 trace: the remaining gap of the chunk-BERT forward after
packed attention is "fp32 LN epilogues"). On the VPU, fp32 elementwise ops
run at half the bf16 rate and double the fusion's register pressure.

This variant keeps the numerically fragile part (the mean/variance
REDUCTIONS and rsqrt) in fp32, then casts (mean, inv) down ONCE and runs
the per-element normalize+affine in the compute dtype. The output is
already quantized to bf16 by the caller's pipeline, so the extra error is
a few bf16 ulps of arithmetic on values that are ~N(0,1) after
normalization — bounded by tests/test_layernorm.py against the flax
all-fp32 chain (atol 1/64 = 2 bf16 ulps at |x|<=2).

Opt-in via encoder.bert_ln="bf16" (default "fp32" keeps flax LayerNorm);
parameter tree ("scale", "bias") is identical to nn.LayerNorm, so
checkpoints and HF imports work unchanged across the knob.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def fast_layer_norm(x, scale, bias, eps: float):
    """fp32 stats, compute-dtype (x.dtype) normalize+affine. x: [..., F]."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    # fast variance (E[x^2] - E[x]^2), clipped like flax to kill roundoff
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    inv = lax.rsqrt(var + jnp.float32(eps))
    dt = x.dtype
    y = (x - mean.astype(dt)) * inv.astype(dt)
    return y * scale.astype(dt) + bias.astype(dt)


class FastLayerNorm(nn.Module):
    """Drop-in for nn.LayerNorm(use_scale=True, use_bias=True): same param
    tree, fp32 stats, compute-dtype affine. `dtype` is the compute dtype the
    caller already runs in (x is cast to it on entry)."""

    epsilon: float = 1e-12
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (f,), self.param_dtype)
        return fast_layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)


def bert_layer_norm(ln_impl: str, *, epsilon, dtype, param_dtype, name):
    """LN factory for the BERT body: ln_impl "fp32" -> flax nn.LayerNorm
    (all-fp32 normalize+affine), "bf16" -> FastLayerNorm (fp32 stats only).
    """
    if ln_impl == "bf16":
        return FastLayerNorm(
            epsilon=epsilon, dtype=dtype, param_dtype=param_dtype, name=name
        )
    return nn.LayerNorm(
        epsilon=epsilon, dtype=dtype, param_dtype=param_dtype, name=name
    )
