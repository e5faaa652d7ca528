"""Golden parity: per-route MulT fusion family vs the reference's own torch
modules (PhenoModel/routing_and_heads_atten.py:81-262).

Loads MulTCrossAttentionFusion / MulTTriFusion / build_fusions /
make_route_inputs from the reference checkout, injects their weights into the
JAX modules, and asserts numerically identical outputs — including the
last-valid vs literal-last pooling split and the unequal-length
pad-with-masked-extension path.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_reference_parity import (  # noqa: E402
    REF,
    _assert_close,
    _encoder_params,
    _load,
    _stack_streams,
    _stub_env_config,
    lin_kernel,
    t2j,
)

ROUTES_10 = ["L", "N", "I", "LN", "NL", "LI", "IL", "NI", "IN", "LNI"]

if not Path(REF).exists():  # pragma: no cover
    pytest.skip("reference checkout not present", allow_module_level=True)


@pytest.fixture(scope="module")
def ref_atten():
    torch.manual_seed(0)
    pos = _load(
        REF / "PhenoModel/Paired_Cross_Attention/position_embedding.py",
        "ref_position_embedding",
        {},
    )
    mha = _load(
        REF / "PhenoModel/Paired_Cross_Attention/multihead_attention.py",
        "ref_multihead_attention",
        {},
    )
    transformer = _load(
        REF / "PhenoModel/Paired_Cross_Attention/transformer.py",
        "ref_transformer_pheno",
        {"position_embedding": pos, "multihead_attention": mha},
    )
    capsule_layers = _load(REF / "PhenoModel/capsule_layers.py", "ref_capsule_layers_p", {})
    env = _stub_env_config(ROUTES_10)
    env.CFG.cross_attn_heads = 2
    env.CFG.cross_attn_dropout = 0.0
    env.CFG.cross_attn_layers = 2
    env.CFG.cross_attn_mask = True
    env.CFG.cross_use_positional = True
    rha = _load(
        REF / "PhenoModel/routing_and_heads_atten.py",
        "ref_rh_atten",
        {"env_config": env, "capsule_layers": capsule_layers, "transformer": transformer},
    )
    return rha


def _seq_inputs(b, lengths, d, seed=5):
    rng = np.random.default_rng(seed)
    seqs, masks = {}, {}
    for k, t in lengths.items():
        seqs[k] = rng.standard_normal((b, t, d)).astype(np.float32)
        n_valid = rng.integers(1, t + 1, size=(b,))
        masks[k] = (np.arange(t)[None, :] < n_valid[:, None]).astype(np.float32)
    return seqs, masks


class TestMulTCrossAttentionFusionParity:
    @pytest.mark.parametrize("attn_mask", [True, False])
    @pytest.mark.parametrize("use_mask", [True, False])
    def test_directional(self, ref_atten, attn_mask, use_mask):
        from multimodalrouting_tpu.models.route_mult import MulTCrossAttentionFusion

        b, ta, tb, d, heads, layers = 3, 6, 4, 8, 2, 2
        torch.manual_seed(3)
        fus_t = ref_atten.MulTCrossAttentionFusion(
            d, n_heads=heads, layers=layers, attn_mask=attn_mask,
            attn_dropout=0.0, relu_dropout=0.0, res_dropout=0.0, embed_dropout=0.0,
        ).eval()
        seqs, masks = _seq_inputs(b, {"A": ta, "B": tb}, d)
        mA_t = torch.from_numpy(masks["A"]) if use_mask else None
        with torch.no_grad():
            out_t = fus_t(
                torch.from_numpy(seqs["A"]), mA_t,
                torch.from_numpy(seqs["B"]), torch.from_numpy(masks["B"]),
            )

        fus_j = MulTCrossAttentionFusion(
            d=d, n_heads=heads, layers=layers, attn_mask=attn_mask,
            positions="ref_quantized",
        )
        args = (
            jnp.asarray(seqs["A"]),
            jnp.asarray(masks["A"]) if use_mask else None,
            jnp.asarray(seqs["B"]),
            jnp.asarray(masks["B"]),
        )
        variables = fus_j.init(jax.random.PRNGKey(0), *args)
        variables = {"params": {"trans": _encoder_params(fus_t.trans)}}
        out_j = fus_j.apply(variables, *args)
        _assert_close(out_j, out_t.numpy(), "directional route", rtol=1e-4, atol=1e-5)

    def test_empty_mask_clamps_to_first_row(self, ref_atten):
        """Reference clamps lengths to min 1 -> row 0 (NOT zeros) when a
        sample has no valid query steps (routing_and_heads_atten.py:127-129)."""
        from multimodalrouting_tpu.models.route_mult import MulTCrossAttentionFusion

        b, ta, tb, d = 2, 5, 4, 8
        torch.manual_seed(4)
        fus_t = ref_atten.MulTCrossAttentionFusion(
            d, n_heads=2, layers=1, attn_mask=True,
            attn_dropout=0.0, relu_dropout=0.0, res_dropout=0.0, embed_dropout=0.0,
        ).eval()
        seqs, masks = _seq_inputs(b, {"A": ta, "B": tb}, d)
        masks["A"][1] = 0.0  # sample 1: no valid A steps
        with torch.no_grad():
            out_t = fus_t(
                torch.from_numpy(seqs["A"]), torch.from_numpy(masks["A"]),
                torch.from_numpy(seqs["B"]), torch.from_numpy(masks["B"]),
            )
        fus_j = MulTCrossAttentionFusion(
            d=d, n_heads=2, layers=1, attn_mask=True, positions="ref_quantized"
        )
        args = (
            jnp.asarray(seqs["A"]), jnp.asarray(masks["A"]),
            jnp.asarray(seqs["B"]), jnp.asarray(masks["B"]),
        )
        fus_j.init(jax.random.PRNGKey(0), *args)
        out_j = fus_j.apply({"params": {"trans": _encoder_params(fus_t.trans)}}, *args)
        _assert_close(out_j, out_t.numpy(), "empty-mask clamp", rtol=1e-4, atol=1e-5)
        assert float(np.abs(np.asarray(out_j[1])).sum()) > 0.0


def _tri_params(fus_t):
    streams = _stack_streams(
        [_encoder_params(getattr(fus_t, a)) for a in ("L_with_N", "L_with_I", "I_with_N")]
    )
    return {
        "streams": streams,
        "final": {"kernel": lin_kernel(fus_t.final), "bias": t2j(fus_t.final.bias)},
    }


class TestMulTTriFusionParity:
    @pytest.mark.parametrize("attn_mask", [True, False])
    def test_tri_unequal_lengths(self, ref_atten, attn_mask):
        """TL != TN != TI exercises the pad-to-Tmax + masked-extension path
        against the reference running each stack at native length."""
        from multimodalrouting_tpu.models.route_mult import MulTTriFusion

        b, d, heads, layers = 3, 8, 2, 2
        torch.manual_seed(6)
        fus_t = ref_atten.MulTTriFusion(
            d, n_heads=heads, layers=layers, attn_mask=attn_mask,
            attn_dropout=0.0, relu_dropout=0.0, res_dropout=0.0, embed_dropout=0.0,
        ).eval()
        seqs, masks = _seq_inputs(b, {"L": 6, "N": 4, "I": 5}, d)
        with torch.no_grad():
            out_t = fus_t(
                torch.from_numpy(seqs["L"]), torch.from_numpy(masks["L"]),
                torch.from_numpy(seqs["N"]), torch.from_numpy(masks["N"]),
                torch.from_numpy(seqs["I"]), torch.from_numpy(masks["I"]),
            )
        fus_j = MulTTriFusion(
            d=d, n_heads=heads, layers=layers, attn_mask=attn_mask,
            positions="ref_quantized",
        )
        args = (
            jnp.asarray(seqs["L"]), jnp.asarray(masks["L"]),
            jnp.asarray(seqs["N"]), jnp.asarray(masks["N"]),
            jnp.asarray(seqs["I"]), jnp.asarray(masks["I"]),
        )
        fus_j.init(jax.random.PRNGKey(0), *args)
        out_j = fus_j.apply({"params": _tri_params(fus_t)}, *args)
        _assert_close(out_j, out_t.numpy(), "tri route", rtol=1e-4, atol=1e-5)


class TestPerRouteMulTFusionParity:
    def test_full_route_dict(self, ref_atten):
        """build_fusions + make_route_inputs vs the single vmapped program."""
        from multimodalrouting_tpu.models.route_mult import (
            DIRECTIONAL_NAMES,
            PerRouteMulTFusion,
        )

        b, d = 3, 8
        torch.manual_seed(7)
        fusion_t = ref_atten.build_fusions(d)  # CFG: heads=2, layers=2, mask=True
        for mod in fusion_t.values():
            mod.eval()
        seqs, masks = _seq_inputs(b, {"L": 6, "N": 4, "I": 5}, d)
        rng = np.random.default_rng(11)
        pools = {k: rng.standard_normal((b, d)).astype(np.float32) for k in "LNI"}
        z = {
            k: {
                "seq": torch.from_numpy(seqs[k]),
                "mask": torch.from_numpy(masks[k]),
                "pool": torch.from_numpy(pools[k]),
            }
            for k in "LNI"
        }
        with torch.no_grad():
            routes_t = ref_atten.make_route_inputs(z, fusion_t)

        fus_j = PerRouteMulTFusion(
            d=d, n_heads=2, layers=2, attn_mask=True, positions="ref_quantized"
        )
        args = tuple(
            jnp.asarray(a)
            for k in "LNI"
            for a in (seqs[k], masks[k], pools[k])
        )
        fus_j.init(jax.random.PRNGKey(0), *args)
        params = {
            "directional": _stack_streams(
                [_encoder_params(fusion_t[nm].trans) for nm in DIRECTIONAL_NAMES]
            ),
            "LNI": _tri_params(fusion_t["LNI"]),
        }
        routes_j = fus_j.apply({"params": params}, *args)

        assert set(routes_j) == set(routes_t)
        for r in ROUTES_10:
            _assert_close(
                routes_j[r], routes_t[r].numpy(), f"route {r}", rtol=1e-4, atol=1e-5
            )
