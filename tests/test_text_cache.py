"""Frozen-BERT note-embedding cache (encoder.text_embedding_cache)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder
from multimodalrouting_tpu.train.text_cache import (
    attach_note_cache,
    compute_note_chunk_embs,
    find_bbert_params,
)
from tests.helpers import tiny_batch, tiny_config


def _tiny_encoder(**kw):
    return BioClinBERTEncoder(
        d=24, vocab_size=256, hidden=32, layers=1, heads=4,
        intermediate=64, max_position=32, **kw,
    )


def _notes(b=3, s=2, length=16, seed=0):
    r = np.random.default_rng(seed)
    ids = r.integers(1, 256, (b, s, length)).astype(np.int32)
    attn = np.ones((b, s, length), np.float32)
    attn[:, :, 12:] = 0.0
    cm = np.ones((b, s), np.float32)
    cm[0, 1] = 0.0  # one padded chunk
    return {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(attn),
            "chunk_mask": jnp.asarray(cm)}


def test_chunk_embs_path_output_identical():
    """Feeding the sowed pre-proj embeddings back via notes['chunk_embs']
    reproduces the direct forward exactly."""
    enc = _tiny_encoder()
    notes = _notes()
    variables = enc.init(jax.random.PRNGKey(0), notes)

    (h0, cm0, p0), inter = enc.apply(
        variables, notes, mutable=["intermediates"]
    )
    cache = inter["intermediates"]["chunk_embs"][0]
    assert cache.shape == (3, 2, 32)  # [B, S, hidden] pre-proj

    h1, cm1, p1 = enc.apply(variables, {**notes, "chunk_embs": cache})
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(cm0), np.asarray(cm1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_chunk_embs_requires_frozen_text():
    enc = _tiny_encoder(finetune_text=True)
    notes = _notes()
    variables = enc.init(jax.random.PRNGKey(0), notes)
    cache = jnp.zeros((3, 2, 32), jnp.float32)
    with pytest.raises(ValueError, match="finetune_text"):
        enc.apply(variables, {**notes, "chunk_embs": cache})


def test_find_bbert_params():
    tree = {"encoders": {"behrt": {"w": 1}, "bbert": {"bert": {"k": 2}}}}
    assert find_bbert_params(tree) == {"bert": {"k": 2}}
    assert find_bbert_params({"encoders": {"behrt": {}}}) is None


def test_full_model_cached_logits_identical():
    """CapsuleRoutingModel forward with attach_note_cache == without."""
    from multimodalrouting_tpu.models.full import build_model

    cfg = tiny_config()
    batch = tiny_batch(n=4)
    model = build_model(cfg, "capsule")
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    out_direct = model.apply(variables, batch, train=False)
    cached = attach_note_cache(cfg, variables["params"], batch)
    assert cached.note_chunk_embs.shape == (4, batch.note_ids.shape[1], 32)
    out_cached = model.apply(variables, cached, train=False)
    # the cached program has different XLA fusion boundaries, so fp32
    # rounding can differ by ~1 ULP — same computation, not a semantics change
    np.testing.assert_allclose(
        np.asarray(out_direct.logits), np.asarray(out_cached.logits),
        rtol=2e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_direct.alpha), np.asarray(out_cached.alpha),
        rtol=2e-6, atol=1e-6,
    )


def test_cache_minibatched_matches_single_shot():
    from multimodalrouting_tpu.models.full import build_model

    cfg = tiny_config()
    batch = tiny_batch(n=6)
    model = build_model(cfg, "capsule")
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    one = compute_note_chunk_embs(cfg, variables["params"], batch, batch_size=6)
    mb = compute_note_chunk_embs(cfg, variables["params"], batch, batch_size=4)
    np.testing.assert_array_equal(one, mb)


@pytest.mark.slow
def test_train_model_cached_matches_uncached_trajectory():
    """Same seed, cache on vs off: identical fp32 loss trajectory (the cache
    must be a pure compute-reuse, not a semantics change)."""
    from multimodalrouting_tpu.models.full import build_model
    from multimodalrouting_tpu.train.loop import train_model

    def run(cache: bool):
        cfg = tiny_config(**{
            "encoder.text_embedding_cache": cache,
            "train.epochs": 2,
            "train.use_ema": False,
            "train.sampler_mode": "none",
            "data.synthetic_n": 16,
        })
        model = build_model(cfg, "capsule")
        tr, va = tiny_batch(n=16, seed=0), tiny_batch(n=8, seed=1)
        res = train_model(cfg, model, tr, va, family="capsule", log_fn=lambda s: None)
        return [h["train_loss"] for h in res.history]

    base, cached = run(False), run(True)
    np.testing.assert_allclose(base, cached, rtol=1e-5)


def test_cache_rejects_streaming(tmp_path):
    from multimodalrouting_tpu.models.full import build_model
    from multimodalrouting_tpu.train.loop import train_model

    class _FakeStream:
        batch_size = 8

        def example_batch(self, n):
            return tiny_batch(n=n)

        def epoch_iter(self, epoch, bs):
            yield tiny_batch(n=bs)

    cfg = tiny_config(**{
        "encoder.text_embedding_cache": True,
        "train.epochs": 1,
        "train.sampler_mode": "none",
    })
    model = build_model(cfg, "capsule")
    with pytest.raises(ValueError, match="dense split"):
        train_model(cfg, model, _FakeStream(), tiny_batch(n=4),
                    family="capsule", log_fn=lambda s: None)


@pytest.mark.slow
def test_cli_train_eval_with_cache(tmp_path, capsys):
    """cli train --set encoder.text_embedding_cache=true -> cli eval reuses
    the cache (incl. the drop table, whose conditions act on has_* only)."""
    import json as _json

    from multimodalrouting_tpu import cli

    sets = [
        "data.synthetic_n=8", "train.epochs=1", "train.batch_size=4",
        "train.use_ema=false", "encoder.text_embedding_cache=true",
    ]
    tiny_sets = [
        "encoder.d=16", "model.d=16", "encoder.bert_layers=1",
        "encoder.bert_hidden=16", "encoder.bert_heads=2",
        "encoder.bert_intermediate=32", "encoder.bert_vocab_size=256",
        "encoder.bert_max_position=32", "encoder.text_max_len=16",
        "encoder.notes_max_chunks=2", "encoder.structured_seq_len=8",
        "encoder.structured_n_feats=8", "encoder.structured_layers=1",
        "encoder.structured_heads=2", "model.mult_layers=1",
        "model.mult_self_layers=1", "model.mult_heads=2", "model.pc_dim=4",
        "model.mc_caps_dim=8", "encoder.vision_backbone=resnet18",
        "encoder.vision_norm=group", "encoder.image_size=32",
    ]
    argv = ["train", "--family", "capsule", "--task", "mort",
            "--out", str(tmp_path)]
    for s in sets + tiny_sets:
        argv += ["--set", s]
    assert cli.main(argv) == 0
    capsys.readouterr()

    rc = cli.main(["eval", "--ckpt", str(tmp_path), "--drop-table"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dropN" in out  # drop table printed
    metrics = _json.loads(out[: out.index("}") + 1])
    assert np.isfinite(metrics["auroc"])
