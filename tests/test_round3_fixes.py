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


def test_frozen_bert_bf16_at_rest(tmp_path):
    """encoder.frozen_text_bf16 stores the frozen BERT body as bf16 masters;
    trainable leaves stay fp32; checkpoints restore back to the template's
    dtypes (PERF.md headroom item 2)."""
    import jax
    import jax.numpy as jnp

    from multimodalrouting_tpu.ckpt import restore_checkpoint, save_checkpoint
    from multimodalrouting_tpu.models.full import build_model
    from multimodalrouting_tpu.train.state import create_train_state

    cfg = tiny_config(**{"model.dtype": "bfloat16", "model.routes": "7",
                         "model.num_classes": 2, "train.use_ema": True})
    model = build_model(cfg, "capsule")
    batch = tiny_batch(n=4)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = create_train_state(cfg, model, variables)

    bert = state.params["encoders"]["bbert"]["bert"]
    dts = {str(x.dtype) for x in jax.tree_util.tree_leaves(bert)}
    assert dts == {"bfloat16"}, dts
    # non-BERT leaves keep fp32 masters
    other = state.params["encoders"]["behrt"]
    assert {str(x.dtype) for x in jax.tree_util.tree_leaves(other)} == {"float32"}
    # EMA mirrors the storage dtypes
    assert {str(x.dtype) for x in jax.tree_util.tree_leaves(
        state.ema_params["encoders"]["bbert"]["bert"])} == {"bfloat16"}

    # checkpoint round-trip preserves the template's dtypes
    save_checkpoint(str(tmp_path), state, cfg, name="last")
    restored = restore_checkpoint(str(tmp_path), state, name="last")
    rb = restored.params["encoders"]["bbert"]["bert"]
    assert {str(x.dtype) for x in jax.tree_util.tree_leaves(rb)} == {"bfloat16"}

    # an fp32-at-rest template restores the same checkpoint as fp32
    cfg32 = tiny_config(**{"model.dtype": "bfloat16", "model.routes": "7",
                           "model.num_classes": 2, "encoder.frozen_text_bf16": "false"})
    state32 = create_train_state(cfg32, model, variables)
    r32 = restore_checkpoint(str(tmp_path), state32, name="last")
    assert {str(x.dtype) for x in jax.tree_util.tree_leaves(
        r32.params["encoders"]["bbert"]["bert"])} == {"float32"}


def test_bert_gelu_knob_validation_and_wiring():
    """encoder.bert_gelu: validated, threaded to the BERT FFN — tanh output
    differs from erf (same params) but only by the approximation's epsilon."""
    import jax
    import numpy as np
    import pytest as _pytest

    from multimodalrouting_tpu.configs import load_cfg

    with _pytest.raises(ValueError, match="bert_gelu"):
        load_cfg(overrides={"encoder.bert_gelu": "quick"}, environ={})

    from multimodalrouting_tpu.models.full import build_model

    cfg_d = tiny_config(**{"model.routes": "7", "model.num_classes": 2})
    assert cfg_d.encoder.bert_gelu == "poly"  # production default (ops/gelu.py)
    cfg_e = tiny_config(**{"model.routes": "7", "model.num_classes": 2,
                           "encoder.bert_gelu": "erf"})
    cfg_t = tiny_config(**{"model.routes": "7", "model.num_classes": 2,
                           "encoder.bert_gelu": "tanh"})
    batch = tiny_batch(n=4)
    model_d = build_model(cfg_d, "capsule")
    model_e, model_t = build_model(cfg_e, "capsule"), build_model(cfg_t, "capsule")
    variables = model_e.init(jax.random.PRNGKey(0), batch, train=False)

    def chunk_embs(model):
        _, inter = model.apply(
            variables, batch, train=False, mutable=["intermediates"]
        )
        return np.asarray(
            jax.tree_util.tree_leaves(inter["intermediates"])[0], np.float32
        )

    cd, ce, ct = chunk_embs(model_d), chunk_embs(model_e), chunk_embs(model_t)
    assert not np.array_equal(ce, ct)  # the knob reaches the FFN
    np.testing.assert_allclose(ce, ct, atol=0.05)  # tanh: approximation only
    # poly tracks exact erf ~50x tighter than tanh does (ops/gelu.py bound)
    np.testing.assert_allclose(cd, ce, atol=1e-3)
