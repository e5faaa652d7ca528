"""Accuracy contract for the polynomial exact-GELU lowering (ops/gelu.py).

The production default (encoder.bert_gelu="poly") replaces XLA's erf
lowering in the BERT FFN (reference runs HF exact GELU,
transformers BertIntermediate; e.g. MortModel/encoders.py:241 loads the
HF body that uses it). The contract proved here:

1. At bf16 — the production compute dtype — the polynomial lowering is
   MORE faithful to float64-exact GELU than XLA's own erf lowering,
   exhaustively over all 65280 finite bf16 codes.
2. Every deviation from float64-exact GELU is at most 1 bf16 ulp plus a
   5e-5 absolute tail allowance (the |x| > 3 snap region).
3. At fp32 the deviation from exact GELU is bounded by 6e-5.
4. Gradients are finite and correct everywhere, including the clamp/snap
   regions and extreme magnitudes.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.ops.gelu import apply_gelu, erf_poly, gelu_poly


def _all_finite_bf16():
    import ml_dtypes

    codes = np.arange(65536, dtype=np.uint16)
    x = codes.view(ml_dtypes.bfloat16)
    return x[np.isfinite(x.astype(np.float64))]


def _gelu64(x64):
    from scipy.special import erf

    return 0.5 * x64 * (1.0 + erf(x64 / np.sqrt(2.0)))


def _ulp_dist_bf16(a, b):
    """Distance in representable-bf16 steps via an order-preserving
    int mapping of the bit patterns."""
    ai = a.view(np.uint16).astype(np.int32)
    bi = b.view(np.uint16).astype(np.int32)

    def key(i):
        return np.where(i >= 0x8000, 0x8000 - i, i + 0x8000)

    return np.abs(key(ai) - key(bi))


@pytest.fixture(scope="module")
def bf16_outputs():
    import ml_dtypes

    x = _all_finite_bf16()
    xj = jnp.asarray(x)
    poly = np.asarray(gelu_poly(xj))
    xla_erf = np.asarray(nn.gelu(xj, approximate=False))
    true_bf = _gelu64(x.astype(np.float64)).astype(ml_dtypes.bfloat16)
    return x, poly, xla_erf, true_bf


def test_bf16_poly_at_least_as_faithful_as_xla_erf(bf16_outputs):
    x, poly, xla_erf, true_bf = bf16_outputs
    poly_match = (_ulp_dist_bf16(poly, true_bf) == 0).mean()
    xla_match = (_ulp_dist_bf16(xla_erf, true_bf) == 0).mean()
    # measured on this build: poly 98.96% vs xla-erf 97.54%
    assert poly_match >= xla_match, (poly_match, xla_match)
    assert poly_match > 0.985


def test_bf16_max_deviation_one_ulp_plus_tail(bf16_outputs):
    x, poly, _, true_bf = bf16_outputs
    x64 = x.astype(np.float64)
    true64 = _gelu64(x64)
    diff = np.abs(poly.astype(np.float64) - true64)
    # one bf16 ulp at the true output magnitude (|v| * 2^-7 covers
    # normalized values; 5e-5 covers the |x| > 3 snap-to-sign tail)
    allowance = np.abs(true64) * 2.0**-7 + 5e-5
    bad = diff > allowance
    assert not bad.any(), (
        f"{bad.sum()} codes exceed 1 ulp + tail allowance; "
        f"worst x={x64[bad][np.argmax(diff[bad])] if bad.any() else None}"
    )


def test_fp32_bound():
    x = np.linspace(-12.0, 12.0, 400001).astype(np.float32)
    got = np.asarray(gelu_poly(jnp.asarray(x))).astype(np.float64)
    want = _gelu64(x.astype(np.float64))
    assert np.max(np.abs(got - want)) < 6e-5
    # erf itself: fitted bound 1.9e-5 in-range, 2.2e-5 snap at |t|>3
    t = np.linspace(-6.0, 6.0, 200001).astype(np.float32)
    from scipy.special import erf as erf64

    e = np.abs(np.asarray(erf_poly(jnp.asarray(t))).astype(np.float64) - erf64(t.astype(np.float64)))
    assert np.max(e) < 2.5e-5


def test_gradients_finite_and_correct():
    g = jax.vmap(jax.grad(lambda v: gelu_poly(v)))
    # includes clamp boundaries, snap regions, and extreme magnitudes
    # (the pre-clamp keeps the unselected where-branch finite)
    x = jnp.asarray([-1e30, -50.0, -3.01, -3.0, -2.99, -1.0, 0.0, 1.0, 2.99, 3.0, 3.01, 50.0, 1e30], jnp.float32)
    got = np.asarray(g(x))
    assert np.isfinite(got).all()
    from scipy.special import erf as erf64

    x64 = np.asarray(x, np.float64)
    pdf = np.exp(-0.5 * x64**2) / np.sqrt(2 * np.pi)
    want = 0.5 * (1 + erf64(x64 / np.sqrt(2))) + x64 * pdf
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_apply_gelu_dispatch():
    x = jnp.linspace(-4, 4, 101, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(apply_gelu(x, "erf")), np.asarray(nn.gelu(x, approximate=False))
    )
    np.testing.assert_array_equal(
        np.asarray(apply_gelu(x, "tanh")), np.asarray(nn.gelu(x, approximate=True))
    )
    np.testing.assert_array_equal(np.asarray(apply_gelu(x, "poly")), np.asarray(gelu_poly(x)))


def test_config_accepts_poly_default():
    from multimodalrouting_tpu.configs import Config, _validate

    cfg = Config()
    assert cfg.encoder.bert_gelu == "poly"
    _validate(cfg)


def test_dtype_preserved():
    x = jnp.asarray([-1.5, 0.25, 2.0], jnp.bfloat16)
    assert gelu_poly(x).dtype == jnp.bfloat16
    x = jnp.asarray([-1.5, 0.25, 2.0], jnp.float32)
    assert gelu_poly(x).dtype == jnp.float32
