"""Serving-path latency/throughput benchmark (serve.py Predictor).

Measures, on the real chip, what a deployment sees:
  - single-record request latency (p50/p95) through `Predictor.predict_records`
    (includes record assembly, padding to the static batch, calibration,
    route-audit extraction — the full request path, not just the XLA step);
  - full-batch scoring throughput (stays/sec) through `Predictor.predict`.

  python scripts/bench_serve.py --ckpt runs/flagship_r3 [--requests 50]
  python scripts/bench_serve.py --artifact runs/flagship_r3_artifact  # jax.export path

With --artifact the same harness drives `artifact.ExportedPredictor`
(deserialized StableHLO, no model re-trace at load), so cold start
(load_s + warmup_compile_s) is directly comparable to the live Predictor.

Prints one JSON line; paste the numbers into PERF.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--artifact", default=None,
                    help="serve a jax.export artifact dir (artifact.ExportedPredictor)")
    ap.add_argument("--family", default="capsule")
    ap.add_argument("--name", default="final")
    ap.add_argument("--requests", type=int, default=50)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="serving batch (default: the training batch size); "
                         "--batch-size 1 measures the low-latency program")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from multimodalrouting_tpu.serve import Predictor, batch_from_records

    if bool(args.ckpt) == bool(args.artifact):
        raise SystemExit("pass exactly one of --ckpt or --artifact")
    t0 = time.perf_counter()
    if args.artifact:
        from multimodalrouting_tpu.artifact import ExportedPredictor

        pred = ExportedPredictor(args.artifact)
    else:
        pred = Predictor(args.ckpt, args.family, name=args.name, batch_size=args.batch_size)
    load_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    pred.warmup()
    warmup_s = time.perf_counter() - t0

    cfg = pred.cfg
    rng = np.random.default_rng(0)
    t, f = cfg.encoder.structured_seq_len, cfg.encoder.structured_n_feats
    synth = cfg.data.synthetic or not cfg.data.data_root
    s = cfg.encoder.notes_max_chunks
    l = min(cfg.encoder.text_max_len, 128) if synth else cfg.encoder.text_max_len
    hw = min(cfg.encoder.image_size, 96) if synth else cfg.encoder.image_size

    def record():
        return {
            "x_struct": rng.normal(size=(t, f)).astype(np.float32),
            "note_ids": rng.integers(1, cfg.encoder.bert_vocab_size, size=(s, l)),
            "image": rng.normal(size=(hw, hw, 3)).astype(np.float32),
        }

    # single-record latency: the interactive-serving case
    lat = []
    for _ in range(args.requests):
        r = record()
        t0 = time.perf_counter()
        pred.predict_records([r])
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3

    # full-batch scoring throughput: the offline-scoring case
    full = batch_from_records(cfg, [record() for _ in range(pred.batch_size)])
    pred.predict(full)  # warm this shape
    t0 = time.perf_counter()
    for _ in range(args.batches):
        pred.predict(full)
    dt = time.perf_counter() - t0
    stays_per_sec = pred.batch_size * args.batches / dt

    print(json.dumps({
        "metric": "serving latency/throughput "
                  f"({'ExportedPredictor' if args.artifact else 'Predictor'}, full request path)",
        "load_s": round(load_s, 2),
        "warmup_compile_s": round(warmup_s, 2),
        "request_p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "request_p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "batch_scoring_stays_per_sec": round(stays_per_sec, 1),
        "serving_batch": pred.batch_size,
    }))


if __name__ == "__main__":
    main()
