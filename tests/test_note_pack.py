"""Chunk packing: BERT over only the valid note chunks must be output-
identical to the dense [B,S] grid (padded chunks are exact zeros either way).

Reference parity: the torch encoder only runs BERT over each patient's real
chunks (MIMIC-IV/MortModel/encoders.py:449-472 chunk_bs minibatches over a
ragged list); packing restores that on static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder, note_pack_capacity


def _enc_and_notes(s=6, b=4, l=32):  # noqa: E741
    rng = np.random.default_rng(0)
    enc = BioClinBERTEncoder(
        d=16, vocab_size=200, hidden=32, layers=2, heads=2,
        intermediate=64, max_position=l,
    )
    ids = rng.integers(5, 200, size=(b, s, l)).astype(np.int32)
    chunk_counts = np.array([1, 3, 6, 2])
    chunk_mask = (np.arange(s)[None, :] < chunk_counts[:, None]).astype(np.float32)
    attn = np.ones((b, s, l), np.int32) * chunk_mask[:, :, None].astype(np.int32)
    ids = ids * attn
    notes = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(attn),
        "chunk_mask": jnp.asarray(chunk_mask),
    }
    return enc, notes, int(chunk_mask.sum())


def test_packed_matches_dense():
    enc, notes, n_valid = _enc_and_notes()
    variables = enc.init(jax.random.PRNGKey(0), notes)

    h_ref, cm_ref, pool_ref = enc.apply(variables, notes)
    # capacity exactly n_valid and with slack both must reproduce the dense out
    for cap in (n_valid, n_valid + 4):
        with note_pack_capacity(cap):
            h, cm, pool = enc.apply(variables, notes)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(cm), np.asarray(cm_ref))
        np.testing.assert_allclose(np.asarray(pool), np.asarray(pool_ref), rtol=2e-5, atol=2e-6)


def test_pack_capacity_off_at_full_grid():
    enc, notes, _ = _enc_and_notes()
    variables = enc.init(jax.random.PRNGKey(0), notes)
    h_ref, _, _ = enc.apply(variables, notes)
    # cap >= B*S means packing is a no-op branch
    with note_pack_capacity(24):
        h, _, _ = enc.apply(variables, notes)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref))


def test_note_pack_bucket_covers_all_valid_chunks():
    from multimodalrouting_tpu.configs import Config
    from multimodalrouting_tpu.data.synthetic import make_synthetic_cohort
    from multimodalrouting_tpu.train.loop import note_pack_bucket

    cfg = Config()
    batch = make_synthetic_cohort(16, s=8, l=32, seed=3)
    cap = note_pack_bucket(cfg, batch)
    n_valid = int(np.asarray(batch.chunk_mask).sum())
    assert cap == 0 or cap >= n_valid
    assert cap <= 16 * 8
    # bucketed: multiples of total//8
    if cap:
        assert cap % 16 == 0


@pytest.mark.slow  # jitted grad compile
def test_packed_gradients_flow_through_projection():
    enc, notes, n_valid = _enc_and_notes()
    variables = enc.init(jax.random.PRNGKey(0), notes)

    def loss(v, cap):
        with note_pack_capacity(cap):
            _, _, pool = enc.apply(v, notes)
        return jnp.sum(pool**2)

    g_dense = jax.grad(loss)(variables, 0)["params"]["proj"]["kernel"]
    g_packed = jax.grad(loss)(variables, n_valid)["params"]["proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_dense), rtol=1e-4, atol=1e-6)


def test_chunk_bucketed_order_preserves_multiset():
    from multimodalrouting_tpu.train.loop import chunk_bucketed_order

    rng = np.random.default_rng(0)
    n, s, bsz = 50, 8, 8
    chunk_mask = (np.arange(s)[None, :] < rng.integers(1, s + 1, size=n)[:, None]).astype(
        np.float32
    )
    order = rng.choice(n, size=n, replace=True)
    out = chunk_bucketed_order(order, chunk_mask, bsz, rng)
    # same sampled multiset
    np.testing.assert_array_equal(np.sort(out), np.sort(order))
    # full batches are tighter than random: max spread of counts within batch
    counts = chunk_mask.sum(1)
    spreads = [
        counts[out[i : i + bsz]].max() - counts[out[i : i + bsz]].min()
        for i in range(0, (n // bsz) * bsz, bsz)
    ]
    rand_spreads = [
        counts[order[i : i + bsz]].max() - counts[order[i : i + bsz]].min()
        for i in range(0, (n // bsz) * bsz, bsz)
    ]
    assert np.mean(spreads) <= np.mean(rand_spreads)
