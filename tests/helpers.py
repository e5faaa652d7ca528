"""Shared tiny-config helpers for tests."""
from multimodalrouting_tpu.configs import Config, apply_overrides
from multimodalrouting_tpu.data.synthetic import make_synthetic_cohort

TINY = {
    "encoder.d": 32,
    "encoder.structured_seq_len": 12,
    "encoder.structured_n_feats": 16,
    "encoder.structured_layers": 1,
    "encoder.structured_heads": 4,
    "encoder.bert_hidden": 32,
    "encoder.bert_layers": 1,
    "encoder.bert_heads": 4,
    "encoder.bert_intermediate": 64,
    "encoder.bert_vocab_size": 1024,
    "encoder.bert_max_position": 64,
    "encoder.vision_backbone": "resnet18",
    "encoder.vision_norm": "group",
    "model.d": 32,
    "model.mult_layers": 1,
    "model.mult_self_layers": 1,
    "model.mult_heads": 4,
    "model.pc_dim": 8,
    "model.mc_caps_dim": 16,
    "model.gate_hidden": 32,
    "model.smro_gate_hidden": 32,
    "model.dtype": "float32",
    "train.batch_size": 4,
}


def tiny_config(**extra) -> Config:
    over = dict(TINY)
    over.update(extra)
    return apply_overrides(Config(), over)


def tiny_batch(n=4, seed=0, task="mort", missing_rate=0.0):
    return make_synthetic_cohort(
        n,
        t=12,
        f=16,
        s=2,
        l=16,
        image_size=32,
        vocab_size=1024,
        seed=seed,
        task=task,
        missing_rate=missing_rate,
    )
