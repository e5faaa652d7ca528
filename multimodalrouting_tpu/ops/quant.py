"""Dynamic int8 quantization for the frozen-BERT inference path.

The frozen Bio-ClinicalBERT forward (finetune_text=False, the reference
default — MIMIC-IV/MortModel/Paired_Cross_Attention/main.py:2801-2807) is
pure inference: no gradients flow through it (`stop_gradient` prunes the
backward), so its six big matmuls per layer (q/k/v/out projections + the two
FFN matmuls ≈ 90% of BERT FLOPs) can run on the MXU's int8 path, which has
2x the bf16 peak on v5e (394 vs 197 TOP/s).

Scheme (standard dynamic activation quantization):
  * weights:      symmetric per-output-channel int8, scale = max|W[:,o]|/127
  * activations:  symmetric per-token int8,         scale = max|x[t,:]|/127
  * accumulate int32 on the MXU, dequantize fp32, add bias, cast to compute
    dtype.

Both quantizations happen inside the jitted forward every step — the
elementwise scan over W (440 MB fp32) costs well under 1 ms of HBM traffic at
v5e bandwidth vs the ~150 ms matmul body, and keeping the master params fp32
means checkpoints, HF weight import, and the parity tests are untouched.

This is intentionally NOT wired into any trainable path: `QuantDense` has no
useful gradient (round() is piecewise-constant), and callers must gate it on
the frozen-text configuration (see models/clinbert.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_per_channel(w: jnp.ndarray, axis: int = 0):
    """Symmetric int8 per-channel quantization of a [in, out] kernel.

    Returns (wq int8, scale fp32 broadcastable against the matmul output).
    """
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=axis, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    wq = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return wq, s


def quantize_per_token(x: jnp.ndarray):
    """Symmetric int8 per-token (last-axis) quantization of activations."""
    x32 = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    xq = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return xq, s


def int8_matmul(xq: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
    """[... , K] int8 @ [K, N] int8 -> [..., N] int32 on the MXU."""
    return jax.lax.dot_general(
        xq,
        wq,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


class QuantDense(nn.Module):
    """Drop-in nn.Dense replacement running the matmul in int8.

    Parameter names/shapes are identical to nn.Dense ("kernel" [in, out],
    "bias" [out]) so checkpoints and `import_hf_bert_params` work unchanged.
    Inference-only: do not place on a differentiated path.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), self.param_dtype
        )
        wq, s_w = quantize_per_channel(kernel)  # s_w: [1, N]
        xq, s_x = quantize_per_token(x)  # s_x: [..., 1]
        y = int8_matmul(xq, wq).astype(jnp.float32) * s_x * s_w.reshape(
            (1,) * (x.ndim - 1) + (-1,)
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)
