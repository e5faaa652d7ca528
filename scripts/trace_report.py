"""Capture + summarize an xplane device trace for a bench workload.

Round-3 found its kernel wins (packed attention, GELU lowering) from xplane
traces parsed by hand; this commits that workflow. Runs one of several
workloads under jax.profiler.trace on the real chip, then parses the dumped
`*.xplane.pb` directly (tensorflow.tsl xplane proto — the
tensorboard_plugin_profile converter is broken in this image) and prints the
top device ops by total time, grouped by HLO category when present.

Usage:
  python scripts/trace_report.py cxr         # CXR encoder fwd (train+eval)
  python scripts/trace_report.py step        # full train step (BENCH_FINETUNE=1 for fine-tuned)
  python scripts/trace_report.py step_cached # train step with the note-embedding cache attached
  python scripts/trace_report.py bert        # chunk-BERT fwd
Env: BENCH_BATCH/BENCH_CHUNKS/BENCH_FINETUNE as in bench.py; TRACE_DIR.
"""
from __future__ import annotations

import collections
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def summarize_xplane(log_dir: str, top: int = 40):
    """Parse the newest xplane.pb under log_dir; return per-op totals for the
    device plane (ps -> ms), grouped by event name, with hlo_category."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {log_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    rows = []
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        per_op = collections.defaultdict(float)
        op_cat = {}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else str(ev.metadata_id)
                per_op[name] += ev.duration_ps / 1e9  # -> ms
                if name not in op_cat and m:
                    for st in ev.stats:
                        sm = stat_meta.get(st.metadata_id)
                        if sm and sm.name == "hlo_category":
                            if st.str_value:
                                op_cat[name] = st.str_value
                            else:
                                # stored by reference: ref_value indexes
                                # stat_metadata, whose .name is the string
                                ref = stat_meta.get(st.ref_value)
                                op_cat[name] = ref.name if ref else str(st.ref_value)
        for name, ms in per_op.items():
            rows.append({"op": name, "ms": ms, "category": op_cat.get(name, "")})
    rows.sort(key=lambda r: -r["ms"])

    total_ms = sum(r["ms"] for r in rows)  # over ALL ops, before top-N cut
    by_cat = collections.defaultdict(float)
    for r in rows:
        by_cat[r["category"] or "uncategorized"] += r["ms"]
    return rows[:top], dict(sorted(by_cat.items(), key=lambda kv: -kv[1])), total_ms


def _mk(cfg_overrides=None):
    from multimodalrouting_tpu.configs import Config, apply_overrides
    from multimodalrouting_tpu.data.synthetic import make_synthetic_cohort

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    chunks = int(os.environ.get("BENCH_CHUNKS", "8"))
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
            "encoder.finetune_text": os.environ.get("BENCH_FINETUNE", "0") == "1",
            **(cfg_overrides or {}),
        },
    )
    batch = make_synthetic_cohort(
        batch_size, t=cfg.encoder.structured_seq_len, f=cfg.encoder.structured_n_feats,
        s=chunks, l=cfg.encoder.text_max_len, image_size=cfg.encoder.image_size,
        vocab_size=cfg.encoder.bert_vocab_size, seed=0, task="mort",
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    return cfg, batch


def workload_cxr():
    cfg, batch = _mk()
    from multimodalrouting_tpu.models.cxr import ImageEncoder

    e, m = cfg.encoder, cfg.model
    enc = ImageEncoder(
        d=m.d, vision_backbone=e.vision_backbone,
        vision_num_classes=e.vision_num_classes, norm_kind=e.vision_norm,
        dtype=jnp.dtype(m.dtype),
    )
    v = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), batch.image))()
    fwd = jax.jit(lambda v: enc.apply(v, batch.image, train=False))

    def run():
        out = fwd(v)
        return float(jnp.ravel(out[2])[0])

    return run


def workload_bert():
    cfg, batch = _mk()
    from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder

    e, m = cfg.encoder, cfg.model
    bert = BioClinBERTEncoder(
        d=e.d, vocab_size=e.bert_vocab_size, hidden=e.bert_hidden,
        layers=e.bert_layers, heads=e.bert_heads, intermediate=e.bert_intermediate,
        max_position=e.bert_max_position, note_agg=e.note_agg,
        chunk_agg=e.note_chunk_agg, dtype=jnp.dtype(m.dtype),
        finetune_text=e.finetune_text,  # frozen_fast_path is derived inside
    )
    v = jax.jit(lambda: bert.init(jax.random.PRNGKey(0), batch.notes_dict()))()
    fwd = jax.jit(lambda v, nd: bert.apply(v, nd))

    def run():
        out = fwd(v, batch.notes_dict())
        return float(jnp.ravel(out[2])[0])

    return run


def workload_step():
    cfg, batch = _mk()
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import note_pack_bucket
    from multimodalrouting_tpu.train.state import create_train_state
    from multimodalrouting_tpu.train.steps import make_train_step

    model = CapsuleRoutingModel(cfg=cfg)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()
    state = create_train_state(cfg, model, variables)
    step_fn = make_train_step(cfg, model, "capsule")
    cap = note_pack_bucket(cfg, batch)
    rng = jax.random.PRNGKey(1)
    lr = jnp.asarray(cfg.train.lr)
    box = {"state": state}

    def run():
        box["state"], metrics = step_fn(box["state"], batch, rng, lr, lr, note_pack=cap)
        leaf = jax.tree_util.tree_leaves(box["state"].params)[0]
        return float(metrics.loss) + float(jnp.ravel(leaf)[0])

    return run


def workload_step_cached():
    """Full train step with the frozen-BERT note-embedding cache attached
    (encoder.text_embedding_cache workflow) — the real frozen-text per-epoch
    program; the BERT body is absent from the traced step entirely."""
    cfg, batch = _mk()
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import note_pack_bucket
    from multimodalrouting_tpu.train.state import create_train_state
    from multimodalrouting_tpu.train.steps import make_train_step
    from multimodalrouting_tpu.train.text_cache import attach_note_cache

    model = CapsuleRoutingModel(cfg=cfg)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()
    batch = attach_note_cache(cfg, variables["params"], batch)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    state = create_train_state(cfg, model, variables)
    step_fn = make_train_step(cfg, model, "capsule")
    cap = note_pack_bucket(cfg, batch)
    rng = jax.random.PRNGKey(1)
    lr = jnp.asarray(cfg.train.lr)
    box = {"state": state}

    def run():
        box["state"], metrics = step_fn(box["state"], batch, rng, lr, lr, note_pack=cap)
        leaf = jax.tree_util.tree_leaves(box["state"].params)[0]
        return float(metrics.loss) + float(jnp.ravel(leaf)[0])

    return run


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    log_dir = os.environ.get("TRACE_DIR", f"/tmp/mmr_trace_{mode}")
    steps = int(os.environ.get("TRACE_STEPS", "3"))
    run = {"cxr": workload_cxr, "bert": workload_bert, "step": workload_step,
           "step_cached": workload_step_cached}[mode]()

    for _ in range(2):  # compile + warm
        run()
    jax.profiler.start_trace(log_dir)
    for _ in range(steps):
        run()
    jax.profiler.stop_trace()

    rows, by_cat, total_ms = summarize_xplane(log_dir)
    print(json.dumps({"mode": mode, "steps_traced": steps,
                      "total_device_ms": round(total_ms, 2),
                      "by_category_ms": {k: round(v, 2) for k, v in by_cat.items()},
                      "top_ops": [
                          {"op": r["op"], "ms": round(r["ms"], 3), "cat": r["category"]}
                          for r in rows[:25]
                      ]}, indent=2))


if __name__ == "__main__":
    main()
