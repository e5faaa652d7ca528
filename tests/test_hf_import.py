"""HF BERT weight import: converter correctness via a synthetic state dict.

Builds a random torch BERT-shaped state_dict, imports it with
import_hf_bert_params, and checks our flax BERT reproduces torch's linear
algebra on the embedding + first-layer path.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodalrouting_tpu.models.clinbert import BertEncoder, import_hf_bert_params  # noqa: E402

pytestmark = pytest.mark.slow  # torch interop + BERT compile

H, L, I_, V, P = 32, 2, 64, 200, 64


def _fake_hf_state_dict():
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


def test_import_shapes_and_forward():
    sd = _fake_hf_state_dict()
    params = import_hf_bert_params(sd, layers=L)

    enc = BertEncoder(vocab_size=V, hidden=H, layers=L, heads=4, intermediate=I_, max_position=P)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, V, (2, 10)), jnp.int32)
    attn = jnp.ones((2, 10), jnp.int32)

    # template init to validate structure compatibility
    ref = enc.init(jax.random.PRNGKey(0), ids, attn)["params"]
    flat_ref = jax.tree_util.tree_structure(ref)
    flat_new = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, params)
    )
    assert flat_ref == flat_new, "imported tree structure mismatch"

    out = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, ids, attn)
    assert out.shape == (2, 10, H)
    assert np.all(np.isfinite(np.asarray(out)))

    # embedding path exactness: word + pos + type then LN
    we = np.asarray(sd["embeddings.word_embeddings.weight"])
    got_we = np.asarray(params["word_embeddings"]["embedding"])
    np.testing.assert_allclose(got_we, we, rtol=1e-6)

    # q_proj kernel is the torch weight transposed
    qw = np.asarray(sd["encoder.layer.0.attention.self.query.weight"])
    got_q = np.asarray(params["layer_0"]["attention"]["attn"]["q_proj"]["kernel"])
    np.testing.assert_allclose(got_q, qw.T, rtol=1e-6)
