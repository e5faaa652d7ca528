"""Measure the frozen-BERT note-embedding cache at bench scale.

Same workload as bench.py (flagship 10-route capsule train step, B=16,
8x512-token chunks) run twice:
  1. direct      — full step incl. the frozen chunk-BERT forward (= bench.py)
  2. cached      — notes['chunk_embs'] precomputed once (train/text_cache.py)
plus the one-time cache-build cost, so the report shows the amortization
point. Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from multimodalrouting_tpu.configs import Config, apply_overrides
    from multimodalrouting_tpu.data.synthetic import make_synthetic_cohort
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import note_pack_bucket
    from multimodalrouting_tpu.train.state import create_train_state
    from multimodalrouting_tpu.train.steps import make_train_step
    from multimodalrouting_tpu.train.text_cache import attach_note_cache

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    chunks = int(os.environ.get("BENCH_CHUNKS", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    cfg = apply_overrides(
        Config(),
        {
            "model.num_classes": 2,
            "model.routes": "10",
            "train.batch_size": batch_size,
            "model.attn_dropout": 0.0,
            "model.relu_dropout": 0.0,
            "model.res_dropout": 0.0,
            "model.embed_dropout": 0.0,
        },
    )

    batch = make_synthetic_cohort(
        batch_size,
        t=cfg.encoder.structured_seq_len,
        f=cfg.encoder.structured_n_feats,
        s=chunks,
        l=cfg.encoder.text_max_len,
        image_size=cfg.encoder.image_size,
        vocab_size=cfg.encoder.bert_vocab_size,
        seed=0,
        task="mort",
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    model = CapsuleRoutingModel(cfg=cfg)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()
    step_fn = make_train_step(cfg, model, "capsule")
    rng = jax.random.PRNGKey(1)
    lr = jnp.asarray(cfg.train.lr)

    # the train step donates its state, so each timed leg needs PRIVATE
    # buffers (jnp.array copies) — reusing one state across legs reads
    # deleted arrays; and the cache build must see un-donated params
    def fresh_state():
        return create_train_state(
            cfg, model, jax.tree_util.tree_map(jnp.array, variables)
        )

    t0 = time.perf_counter()
    cached_batch = attach_note_cache(cfg, variables["params"], batch)
    cached_batch = jax.tree_util.tree_map(jnp.asarray, cached_batch)
    jax.block_until_ready(cached_batch.note_chunk_embs)
    build_s = time.perf_counter() - t0

    def force(state, metrics):
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(metrics.loss) + float(jnp.ravel(leaf)[0])

    def timed(b, cap, st):
        for i in range(warmup):
            st, m = step_fn(st, b, jax.random.fold_in(rng, i), lr, lr, note_pack=cap)
        force(st, m)
        t0 = time.perf_counter()
        for i in range(steps):
            st, m = step_fn(st, b, jax.random.fold_in(rng, warmup + i), lr, lr, note_pack=cap)
        force(st, m)
        return batch_size * steps / (time.perf_counter() - t0)

    direct = timed(batch, note_pack_bucket(cfg, batch), fresh_state())
    cached = timed(cached_batch, 0, fresh_state())

    print(json.dumps({
        "metric": "text-cache train step speedup (10-route trimodal)",
        "direct_stays_per_sec": round(direct, 3),
        "cached_stays_per_sec": round(cached, 3),
        "speedup": round(cached / direct, 2),
        "cache_build_s_incl_compile": round(build_s, 2),
        "batch": batch_size, "chunks": chunks, "steps": steps,
    }))


if __name__ == "__main__":
    main()
