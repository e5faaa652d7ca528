"""End-to-end demo: train the flagship on the synthetic mini-cohort, then
evaluate + export the route audit and the missing-modality drop table.

Runs anywhere (TPU or the virtual CPU mesh):
  python scripts/demo_synthetic.py --epochs 6 --out runs/demo
Produces: metrics JSON, alpha/R heatmap CSV/NPY artifacts, drop table text.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--out", default="runs/demo")
    ap.add_argument("--small", action="store_true", help="tiny dims for CPU")
    args = ap.parse_args()

    from multimodalrouting_tpu.cli import main as cli_main

    sets = [
        "data.synthetic_n=" + str(args.n),
        "train.min_epochs=0",
        "train.early_stop_patience=3",
        "train.encoder_warmup_epochs=1",
        "train.route_dropout_p=0.1",
        "train.ckpt_every=0",  # final-only: per-epoch 1.6GB saves dominate otherwise
    ]
    if args.small:
        sets += [
            "encoder.d=48", "encoder.structured_seq_len=16", "encoder.structured_n_feats=16",
            "encoder.structured_layers=1", "encoder.structured_heads=4",
            "encoder.bert_hidden=48", "encoder.bert_layers=2", "encoder.bert_heads=4",
            "encoder.bert_intermediate=96", "encoder.bert_vocab_size=2048",
            "encoder.bert_max_position=64", "encoder.notes_max_chunks=2",
            "encoder.text_max_len=32", "encoder.image_size=32",
            "encoder.vision_backbone=resnet18", "encoder.vision_norm=group",
            "model.d=48", "model.mult_layers=1", "model.mult_self_layers=1",
            "model.mult_heads=4", "model.pc_dim=8", "model.mc_caps_dim=16",
            "train.batch_size=16",
        ]
    argv = ["train", "--family", "capsule", "--task", "mort", "--routes", "10",
            "--epochs", str(args.epochs), "--out", args.out]
    for s in sets:
        argv += ["--set", s]
    rc = cli_main(argv)
    if rc != 0:
        return rc
    print("\n=== evaluation + audit ===")
    return cli_main(["eval", "--ckpt", args.out, "--family", "capsule", "--drop-table"])


if __name__ == "__main__":
    raise SystemExit(main())
