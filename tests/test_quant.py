"""int8 frozen-BERT path: numerics of QuantDense and end-to-end BERT drift.

The int8 path (ops/quant.py) is an inference-only optimization of the frozen
Bio-ClinicalBERT forward (reference default finetune_text=False,
MIMIC-IV/MortModel/Paired_Cross_Attention/main.py:2801-2807): it must keep
the same parameter tree (checkpoints / HF import untouched) and stay close to
the fp32 reference output.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalrouting_tpu.ops.quant import QuantDense, quantize_per_channel, quantize_per_token


def test_quant_dense_matches_fp32_dense():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)

    from flax import linen as nn

    dense = nn.Dense(80, name="d")
    params = dense.init(jax.random.PRNGKey(1), x)
    ref = dense.apply(params, x)

    qdense = QuantDense(80, name="d")
    got = qdense.apply(params, x)  # same param tree, quantized matmul

    ref = np.asarray(ref)
    got = np.asarray(got)
    # global relative error (elementwise rel err is meaningless near ref~0)
    fro = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert float(fro) < 0.05, fro
    # worst element bounded relative to the output scale
    assert float(np.max(np.abs(got - ref))) < 0.2 * float(ref.std())


def test_quantizers_roundtrip_ranges():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((32, 48)) * 3.0, jnp.float32)
    wq, s_w = quantize_per_channel(w)
    assert wq.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(wq.astype(jnp.int32)))) <= 127
    back = wq.astype(jnp.float32) * s_w
    assert float(jnp.max(jnp.abs(back - w))) <= float(jnp.max(s_w)) * 0.51

    x = jnp.asarray(rng.standard_normal((4, 7, 32)), jnp.float32)
    xq, s_x = quantize_per_token(x)
    assert xq.shape == x.shape and s_x.shape == (4, 7, 1)


@pytest.mark.slow  # two 2-layer BERT compiles
def test_int8_bert_close_to_fp32_bert():
    from multimodalrouting_tpu.models.clinbert import BertEncoder

    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 500, size=(4, 64)), jnp.int32)
    attn = jnp.ones((4, 64), jnp.float32)

    kw = dict(vocab_size=500, hidden=64, layers=2, heads=4, intermediate=128, max_position=64)
    fp = BertEncoder(**kw)
    variables = fp.init(jax.random.PRNGKey(0), ids, attn)
    ref = np.asarray(fp.apply(variables, ids, attn))[:, 0]  # CLS states

    q = BertEncoder(int8=True, **kw)
    got = np.asarray(q.apply(variables, ids, attn))[:, 0]

    # cosine similarity of CLS embeddings stays ~1 under int8 quantization
    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-9
    )
    assert float(cos.min()) > 0.995, cos


def test_int8_requires_frozen_text():
    from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder

    enc = BioClinBERTEncoder(
        d=16, finetune_text=True, int8=True,
        vocab_size=100, hidden=32, layers=1, heads=2, intermediate=64, max_position=32,
    )
    notes = {
        "input_ids": jnp.zeros((2, 1, 32), jnp.int32),
        "attention_mask": jnp.ones((2, 1, 32), jnp.float32),
    }
    with pytest.raises(ValueError, match="int8"):
        enc.init(jax.random.PRNGKey(0), notes)
