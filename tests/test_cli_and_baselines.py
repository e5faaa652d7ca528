"""CLI smoke tests (tiny synthetic runs) + baseline model tests."""
import json
import os

import jax
import numpy as np
import pytest

from multimodalrouting_tpu.models.baselines import build_baseline
from tests.helpers import tiny_batch, tiny_config

pytestmark = pytest.mark.slow  # end-to-end CLI runs

TINY_SETS = [
    "encoder.d=32", "encoder.structured_seq_len=12", "encoder.structured_n_feats=16",
    "encoder.structured_layers=1", "encoder.structured_heads=4",
    "encoder.bert_hidden=32", "encoder.bert_layers=1", "encoder.bert_heads=4",
    "encoder.bert_intermediate=64", "encoder.bert_vocab_size=1024",
    "encoder.bert_max_position=64", "encoder.notes_max_chunks=2",
    "encoder.text_max_len=16", "encoder.image_size=32",
    "encoder.vision_backbone=resnet18", "encoder.vision_norm=group",
    "model.d=32", "model.mult_layers=1", "model.mult_self_layers=1",
    "model.mult_heads=4", "model.pc_dim=8", "model.mc_caps_dim=16",
    "model.gate_hidden=32", "model.smro_gate_hidden=32", "model.dtype=float32",
    "train.batch_size=8", "train.min_epochs=0", "train.early_stop_patience=2",
    "train.encoder_warmup_epochs=0", "data.synthetic_n=24",
]


def _sets():
    out = []
    for s in TINY_SETS:
        out += ["--set", s]
    return out


@pytest.mark.parametrize("name", ["late_fusion", "trimf"])
def test_baseline_models_forward(name):
    cfg = tiny_config(**{"model.num_classes": 25})
    batch = tiny_batch(task="pheno")
    model = build_baseline(cfg, name)
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(params, batch, train=False)
    assert out.logits.shape == (4, 25)
    assert np.all(np.isfinite(np.asarray(out.logits)))
    if name == "trimf":
        np.testing.assert_allclose(np.asarray(out.gates).sum(1), 1.0, rtol=1e-4)


def test_cli_train_and_eval_capsule(tmp_path, capsys):
    from multimodalrouting_tpu.cli import main

    out = str(tmp_path / "run")
    rc = main(
        ["train", "--family", "capsule", "--task", "mort", "--routes", "10",
         "--epochs", "2", "--out", out] + _sets()
    )
    assert rc == 0
    captured = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(captured[-1])
    assert summary["epochs_ran"] == 2
    assert os.path.exists(os.path.join(out, "final.msgpack"))

    rc = main(["eval", "--ckpt", out, "--family", "capsule", "--drop-table"])
    assert rc == 0
    out_text = capsys.readouterr().out
    assert "auroc" in out_text and "dropN" in out_text
    assert os.path.exists(os.path.join(out, "test_route_audit.json"))


def test_cli_train_fame_staged(tmp_path, capsys):
    from multimodalrouting_tpu.cli import main

    out = str(tmp_path / "fame")
    rc = main(
        ["train", "--family", "fame", "--task", "multitask", "--stage", "uni",
         "--epochs", "1", "--out", out] + _sets()
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["stage"] == "uni"
