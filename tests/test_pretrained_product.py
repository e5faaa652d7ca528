"""Product-path pretrained init: encoder.bert_weights / encoder.vision_weights.

The reference starts from AutoModel.from_pretrained (encoders.py:241) and
torchvision pretrained=True (encoders.py:394); here torch.save()d state_dicts
configured on EncoderConfig are spliced into fresh init variables by
pretrained.apply_pretrained (called from train_model). This test drives the
splice on the full flagship model init and checks the imported leaves landed
(converted + cast), while untouched modules keep their random init.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.helpers import tiny_batch, tiny_config
from tests.test_torchvision_import import TvResNet

pytestmark = pytest.mark.slow


def _fake_hf_state_dict(V, H, L, I_, P):
    g = torch.Generator().manual_seed(0)
    sd = {}

    def lin(name, dout, din):
        sd[f"{name}.weight"] = torch.randn(dout, din, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(dout, generator=g) * 0.01

    sd["embeddings.word_embeddings.weight"] = torch.randn(V, H, generator=g) * 0.05
    sd["embeddings.position_embeddings.weight"] = torch.randn(P, H, generator=g) * 0.05
    sd["embeddings.token_type_embeddings.weight"] = torch.randn(2, H, generator=g) * 0.05
    sd["embeddings.LayerNorm.weight"] = torch.ones(H)
    sd["embeddings.LayerNorm.bias"] = torch.zeros(H)
    for i in range(L):
        p = f"encoder.layer.{i}"
        lin(f"{p}.attention.self.query", H, H)
        lin(f"{p}.attention.self.key", H, H)
        lin(f"{p}.attention.self.value", H, H)
        lin(f"{p}.attention.output.dense", H, H)
        sd[f"{p}.attention.output.LayerNorm.weight"] = torch.ones(H)
        sd[f"{p}.attention.output.LayerNorm.bias"] = torch.zeros(H)
        lin(f"{p}.intermediate.dense", I_, H)
        lin(f"{p}.output.dense", H, I_)
        sd[f"{p}.output.LayerNorm.weight"] = torch.ones(H)
        sd[f"{p}.output.LayerNorm.bias"] = torch.zeros(H)
    return sd


def test_apply_pretrained_splices_both_encoders(tmp_path):
    from multimodalrouting_tpu.models.full import build_model
    from multimodalrouting_tpu.pretrained import apply_pretrained

    cfg = tiny_config(**{
        "encoder.vision_norm": "batch",
        "model.routes": "10",
        "model.num_classes": 2,
    })
    e = cfg.encoder
    bert_sd = _fake_hf_state_dict(
        e.bert_vocab_size, e.bert_hidden, e.bert_layers,
        e.bert_intermediate, e.bert_max_position,
    )
    tv = TvResNet((2, 2, 2, 2))
    torch.save(bert_sd, tmp_path / "bert.pt")
    torch.save(tv.state_dict(), tmp_path / "resnet18.pt")

    model = build_model(cfg, "capsule")
    batch = tiny_batch(n=4)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    cfg2 = tiny_config(**{
        "encoder.vision_norm": "batch",
        "model.routes": "10",
        "model.num_classes": 2,
        "encoder.bert_weights": str(tmp_path / "bert.pt"),
        "encoder.vision_weights": str(tmp_path / "resnet18.pt"),
    })
    out = apply_pretrained(cfg2, variables, log_fn=lambda s: None)

    # BERT word embeddings landed verbatim
    np.testing.assert_allclose(
        np.asarray(out["params"]["encoders"]["bbert"]["bert"]
                   ["word_embeddings"]["embedding"]),
        bert_sd["embeddings.word_embeddings.weight"].numpy(), atol=0,
    )
    # vision conv1 landed OIHW->HWIO transposed, running stats into batch_stats
    np.testing.assert_allclose(
        np.asarray(out["params"]["encoders"]["imgenc"]["backbone"]["conv1"]["kernel"]),
        tv.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0), atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(out["batch_stats"]["encoders"]["imgenc"]["backbone"]["bn1"]["mean"]),
        tv.state_dict()["bn1.running_mean"].numpy(), atol=0,
    )
    # untouched modules keep their original init (projection head)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["encoders"]["imgenc"]["proj"]["kernel"]),
        np.asarray(variables["params"]["encoders"]["imgenc"]["proj"]["kernel"]),
    )

    # the model still runs with the spliced variables
    outputs = model.apply(out, batch, train=False)
    for leaf in jax.tree_util.tree_leaves(outputs):
        assert np.isfinite(np.asarray(leaf, dtype=np.float32)).all()


def test_unimodal_note_driver_uses_bert_weights(tmp_path):
    """The unimodal note driver's frozen-BERT embedding pass must honor
    encoder.bert_weights (01_BioClinicalBert.py embeds with the real
    Bio_ClinicalBERT, not a random body)."""
    from multimodalrouting_tpu.train.unimodal import _note_embeddings

    cfg0 = tiny_config(**{"train.batch_size": 8})
    e = cfg0.encoder
    bert_sd = _fake_hf_state_dict(
        e.bert_vocab_size, e.bert_hidden, e.bert_layers,
        e.bert_intermediate, e.bert_max_position,
    )
    torch.save(bert_sd, tmp_path / "bert.pt")
    cfg1 = tiny_config(**{
        "train.batch_size": 8,
        "encoder.bert_weights": str(tmp_path / "bert.pt"),
    })
    b = tiny_batch(n=8)
    (rand_embs,) = _note_embeddings(cfg0, [b])
    (pre_embs,) = _note_embeddings(cfg1, [b])
    assert rand_embs.shape == pre_embs.shape
    # pretrained body produces different (and finite) embeddings
    assert np.isfinite(pre_embs).all()
    assert not np.allclose(rand_embs, pre_embs)
    # deterministic given the weights
    (pre_embs2,) = _note_embeddings(cfg1, [b])
    np.testing.assert_allclose(pre_embs, pre_embs2, atol=0)


def test_vision_weights_require_batch_norm(tmp_path):
    from multimodalrouting_tpu.models.full import build_model
    from multimodalrouting_tpu.pretrained import apply_pretrained

    tv = TvResNet((2, 2, 2, 2))
    torch.save(tv.state_dict(), tmp_path / "resnet18.pt")
    cfg = tiny_config(**{
        "model.routes": "10", "model.num_classes": 2,
        "encoder.vision_weights": str(tmp_path / "resnet18.pt"),
    })  # vision_norm stays "group"
    model = build_model(cfg, "capsule")
    variables = model.init(jax.random.PRNGKey(0), tiny_batch(n=4), train=False)
    with pytest.raises(ValueError, match="vision_norm=batch"):
        apply_pretrained(cfg, variables, log_fn=lambda s: None)
