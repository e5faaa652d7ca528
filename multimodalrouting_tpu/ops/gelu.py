"""BERT FFN activation variants (encoder.bert_gelu knob).

The reference runs HF's exact GELU (``x * 0.5 * (1 + erf(x/sqrt(2)))``,
transformers BertIntermediate) — the default "erf" mode matches it through
XLA's own erf lowering. On this XLA/libtpu build that lowering is the
single most expensive elementwise op in the model: the FFN activation
tensor on the packed chunk grid is ~3.6 GB of bf16 per forward and exact
erf costs ~17% of the WHOLE train step vs the tanh approximation
(PERF.md "GELU lowering").

"poly" is the speed-of-light middle ground: erf evaluated as an odd
minimax polynomial ``t * q(t^2)`` (degree 9 in t^2, fitted on [0, 3])
as a straight chain of fp32 FMAs on the VPU — no transcendental lowering
at all, and XLA fuses it into the matmul epilogue. Accuracy is bounded
far below bf16 resolution where it matters:

- fp32 |erf_poly - erf| <= 1.9e-5 on [-3, 3]; outside, the value snaps to
  +-1 (1 - erf(3) = 2.2e-5, same order as the in-range error).
- the resulting |gelu_poly(x) - gelu(x)| <= ~5e-5 for ALL x, and the
  bf16-rounded outputs are bit-identical to the exact-erf path for every
  bf16 input x >= -2.8 (exhaustively enumerated over all 65536 bf16
  codes in tests/test_gelu_poly.py); mismatches are confined to the deep
  negative tail where |gelu(x)| < 4e-3 and differ by ~1 bf16 ulp.

By contrast "tanh" deviates by up to ~3e-3 — 60x coarser — so "poly" can
serve accuracy-sensitive deployments that still want the VPU win.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

GELU_MODES = ("erf", "tanh", "poly")

# Minimax-ish (iteratively reweighted LSQ) odd polynomial for erf on
# [0, 3]: erf(t) ~= t * q(t^2), q of degree 9. fp32 Horner max abs error
# 1.9e-5 over the interval (measured over 300k points).
_ERF_Q_COEF = (
    1.128358228394435,
    -0.375934855406094,
    0.11232725974952266,
    -0.02623957851832961,
    0.00479421605457915,
    -0.0006719141369009443,
    6.89873418638141e-05,
    -4.820208313091374e-06,
    2.0238708684626765e-07,
    -3.821079094377509e-09,
)
_ERF_BOUND = 3.0
_INV_SQRT2 = 0.7071067811865476


def erf_poly(t):
    """Polynomial erf, fp32 in/out. |err| <= 1.9e-5 in [-3,3], snaps to
    sign(t) outside (1 - erf(3) = 2.2e-5)."""
    tc = jnp.clip(t, -_ERF_BOUND, _ERF_BOUND)  # keeps the unselected
    # branch finite so grads through jnp.where stay clean
    u = tc * tc
    q = jnp.float32(_ERF_Q_COEF[-1])
    for c in _ERF_Q_COEF[-2::-1]:
        q = q * u + jnp.float32(c)
    y = tc * q
    return jnp.where(t > _ERF_BOUND, 1.0, jnp.where(t < -_ERF_BOUND, -1.0, y))


def gelu_poly(x):
    """Exact-GELU via polynomial erf; computed fp32, cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + erf_poly(xf * jnp.float32(_INV_SQRT2)))
    return y.astype(x.dtype)


def apply_gelu(x, mode: str):
    """The encoder.bert_gelu dispatch shared by the layered and pipelined
    BERT stacks (models/clinbert.py, parallel/pp.py)."""
    if mode == "poly":
        return gelu_poly(x)
    return nn.gelu(x, approximate=mode == "tanh")
