"""Round-3 fixes: best/best_f1 dual checkpointing (VERDICT r2 item 8)."""
import os

import pytest

from multimodalrouting_tpu.train.loop import train_model
from tests.helpers import tiny_batch, tiny_config

pytestmark = pytest.mark.slow


def test_best_and_best_f1_dual_checkpoints(tmp_path):
    """The loop persists best.msgpack (VAL AUROC) AND best_f1.msgpack (VAL F1)
    (reference main.py:3336-3358), both restorable."""
    cfg = tiny_config(**{
        "model.routes": "7",
        "model.num_classes": 2,
        "train.epochs": 2,
        "train.use_ema": False,
        "train.sampler_mode": "none",
        "train.min_epochs": 0,
    })
    from multimodalrouting_tpu.models.full import build_model

    model = build_model(cfg, "capsule")
    res = train_model(
        cfg, model, tiny_batch(n=16), tiny_batch(n=8, seed=1),
        family="capsule", log_fn=lambda s: None, ckpt_dir=str(tmp_path),
    )
    for name in ("best", "best_f1", "last"):
        assert os.path.exists(tmp_path / f"{name}.msgpack"), name

    from multimodalrouting_tpu.ckpt import restore_checkpoint

    restored = restore_checkpoint(str(tmp_path), res.state, name="best_f1")
    assert int(restored.step) > 0
