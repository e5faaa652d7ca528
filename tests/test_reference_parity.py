"""Golden parity tests against the reference's OWN PyTorch modules.

These tests import the actual reference code (torch CPU) from
/root/reference/MIMIC-IV, inject identical weights into the flax modules, and
assert fp32 allclose on (logits, alpha, R) — end-to-end through
MULT -> projector -> prior composition -> capsule routing. This is the
bit-level fidelity evidence the self-written NumPy oracles can't provide.

Reference modules under test:
  * MortModel/capsule_layers.py:7-124            (CapsuleFC)
  * MortModel/Paired_Cross_Attention/routing_and_heads.py:101-409
        (RoutePrimaryProjector, CapsuleMortalityHead rmatrix path,
         forward_capsule_from_route_dict, forward_capsule_from_multmodel)
  * MortModel/Paired_Cross_Attention/mult_model.py:7-193 (MULTModel)
  * MortModel/Paired_Cross_Attention/transformer.py + PhenoModel/
    Paired_Cross_Attention/{multihead_attention,position_embedding}.py
  * MortModel/routing_and_heads.py:60-420        (7-route linear fusions,
        biased projector, class-linear head, forward_capsule_from_routes)

The reference's env_config modules are NOT imported (they mutate globals and
read env vars); lightweight stubs with the same ROUTES/CFG surface are
injected instead.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# overridable so the suite can run against a relocated checkout
REF = Path(os.environ.get("MMR_REFERENCE_ROOT", "/root/reference")) / "MIMIC-IV"

pytestmark = [
    pytest.mark.slow,  # loads the torch reference modules
    pytest.mark.skipif(not REF.exists(), reason="reference checkout not available"),
]

ROUTES_10 = ["L", "N", "I", "LN", "NL", "LI", "IL", "NI", "IN", "LNI"]
ROUTES_7 = ["L", "N", "I", "LN", "LI", "NI", "LNI"]


def _stub_env_config(routes, prior_floor=0.02, prior_ceiling=0.98):
    m = types.ModuleType("env_config")
    m.ROUTES = list(routes)
    m.DEVICE = torch.device("cpu")
    m.CFG = types.SimpleNamespace(
        verbose=False,
        routing_coef_mode="none",
        routing_coef_eps=1e-6,
        route_prior_floor=prior_floor,
        route_prior_ceiling=prior_ceiling,
    )
    return m


def _load(path: Path, name: str, deps: dict):
    """Load a reference module by file path with `deps` visible in sys.modules."""
    saved = {}
    for k, v in deps.items():
        saved[k] = sys.modules.get(k)
        sys.modules[k] = v
    try:
        spec = importlib.util.spec_from_file_location(name, str(path))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref():
    """All reference modules, loaded once."""
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
        REF / "MortModel/Paired_Cross_Attention/transformer.py",
        "ref_transformer",
        {"position_embedding": pos, "multihead_attention": mha},
    )
    mult_model = _load(
        REF / "MortModel/Paired_Cross_Attention/mult_model.py",
        "ref_mult_model",
        {"transformer": transformer},
    )
    capsule_layers = _load(REF / "MortModel/capsule_layers.py", "ref_capsule_layers", {})
    env10 = _stub_env_config(ROUTES_10)
    rh_pca = _load(
        REF / "MortModel/Paired_Cross_Attention/routing_and_heads.py",
        "ref_rh_pca",
        {"env_config": env10, "capsule_layers": capsule_layers, "mult_model": mult_model},
    )
    env7 = _stub_env_config(ROUTES_7)
    rh_mort = _load(
        REF / "MortModel/routing_and_heads.py",
        "ref_rh_mort",
        {"env_config": env7, "capsule_layers": capsule_layers},
    )
    return types.SimpleNamespace(
        capsule_layers=capsule_layers,
        mult_model=mult_model,
        rh_pca=rh_pca,
        rh_mort=rh_mort,
        env10=env10,
        env7=env7,
    )


def t2j(x):
    return jnp.asarray(x.detach().cpu().numpy().astype(np.float32))


def lin_kernel(linear):
    return t2j(linear.weight).T


def _assert_close(a, b, name, rtol=1e-5, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=rtol, atol=atol, err_msg=name
    )


# ---------------------------------------------------------------------------
# 1. CapsuleFC routing recurrence
# ---------------------------------------------------------------------------


class TestCapsuleFCParity:
    @pytest.mark.parametrize("act_type", ["ONES", "EM"])
    def test_routing_iterations(self, ref, act_type):
        """capsule_routing vs the reference CapsuleFC driven exactly like
        CapsuleMortalityHead's loop (routing_and_heads.py:224-255)."""
        from multimodalrouting_tpu.ops.capsule import capsule_routing

        torch.manual_seed(1)
        n, a, m, d, b, iters = 10, 8, 4, 16, 3, 3
        fc = ref.capsule_layers.CapsuleFC(
            in_n_capsules=n, in_d_capsules=a, out_n_capsules=m, out_d_capsules=d,
            n_rank=0, dp=0.0, dim_pose_to_vote=0, act_type=act_type,
        ).eval()
        pose_t = torch.randn(b, n, a)
        act_t = torch.rand(b, n, 1)

        with torch.no_grad():
            next_pose, next_act, coef = None, None, None
            for it in range(iters):
                next_pose, next_act, coef = fc(
                    input=pose_t, current_act=act_t, num_iter=it,
                    next_capsule_value=next_pose, next_act=next_act,
                )

        out = capsule_routing(
            t2j(pose_t), t2j(act_t)[..., 0], t2j(fc.w), iters,
            mode="softmax_out", act_type=act_type,
        )
        _assert_close(out.pose, next_pose.numpy(), "decision pose")
        _assert_close(out.act, next_act.numpy(), "decision act")
        _assert_close(out.coef, coef.numpy(), "routing coefficients")

    def test_uniform_routing(self, ref):
        from multimodalrouting_tpu.ops.capsule import capsule_routing

        torch.manual_seed(2)
        n, a, m, d, b = 7, 4, 2, 8, 2
        fc = ref.capsule_layers.CapsuleFC(
            in_n_capsules=n, in_d_capsules=a, out_n_capsules=m, out_d_capsules=d,
            n_rank=0, dp=0.0, dim_pose_to_vote=0, act_type="ONES",
        ).eval()
        pose_t = torch.randn(b, n, a)
        act_t = torch.rand(b, n, 1)
        with torch.no_grad():
            next_pose, next_act, coef = None, None, None
            for it in range(3):
                next_pose, next_act, coef = fc(
                    input=pose_t, current_act=act_t, num_iter=it,
                    next_capsule_value=next_pose, next_act=next_act,
                    uniform_routing=True,
                )
        out = capsule_routing(
            t2j(pose_t), t2j(act_t)[..., 0], t2j(fc.w), 3,
            mode="softmax_out", act_type="ONES", uniform_routing=True,
        )
        _assert_close(out.pose, next_pose.numpy(), "uniform decision pose")
        _assert_close(out.coef, coef.numpy(), "uniform coefficients")


# ---------------------------------------------------------------------------
# 2. PCA capsule head (rmatrix path) + prior-composition bridge
# ---------------------------------------------------------------------------


def _make_pca_head(ref, pc_dim, mc_dim, num_classes, num_routing):
    torch.manual_seed(3)
    head = ref.rh_pca.CapsuleMortalityHead(
        pc_dim=pc_dim, mc_caps_dim=mc_dim, num_routing=num_routing,
        dp=0.0, act_type="ONES", num_classes=num_classes,
    ).eval()
    with torch.no_grad():
        head.embedding.normal_(std=0.5)  # zeros-init would hide logit drift
        head.bias.normal_(std=0.1)
    return head


def _inject_capsule_head(params, head):
    params = dict(params)
    params["w"] = t2j(head.capsule.w)
    params["pose_to_mc"] = {"kernel": lin_kernel(head.pose_to_mc)}
    params["embedding"] = t2j(head.embedding)
    params["bias"] = t2j(head.bias)
    return params


class TestCapsuleHeadRMatrixParity:
    @pytest.mark.parametrize("use_mask", [False, True])
    def test_head(self, ref, use_mask):
        from multimodalrouting_tpu.routing.capsule_head import CapsuleHead

        pc, mc, k, r, b = 8, 16, 5, 10, 4
        head_t = _make_pca_head(ref, pc, mc, k, num_routing=3)
        torch.manual_seed(4)
        poses_t = torch.randn(b, r, pc)
        acts_t = torch.rand(b, r, 1) * 0.96 + 0.02
        rng = np.random.default_rng(5)
        mask_np = None
        if use_mask:
            mask_np = rng.integers(0, 2, size=(b, r)).astype(np.float32)
            mask_np[:, 0] = 1.0  # at least one live route per sample
        mask_t = None if mask_np is None else torch.from_numpy(mask_np)

        with torch.no_grad():
            logits_t, alpha_t, r_t = head_t(
                prim_pose=poses_t, prim_act=acts_t, route_mask=mask_t
            )

        head_j = CapsuleHead(
            num_routes=r, pc_dim=pc, mc_caps_dim=mc, num_classes=k,
            num_routing=3, head_style="rmatrix",
        )
        poses_j, acts_j = t2j(poses_t), t2j(acts_t)
        mask_j = None if mask_np is None else jnp.asarray(mask_np)
        variables = head_j.init(jax.random.PRNGKey(0), poses_j, acts_j, route_mask=mask_j)
        variables = {"params": _inject_capsule_head(variables["params"], head_t)}
        out = head_j.apply(variables, poses_j, acts_j, route_mask=mask_j)

        _assert_close(out.logits, logits_t.numpy(), "rmatrix logits")
        _assert_close(out.alpha, alpha_t.numpy(), "alpha")
        _assert_close(out.r_matrix, r_t.numpy(), "R matrix")


def _inject_projector(params, proj_t, routes, with_bias=False):
    params = dict(params)
    params["kernel"] = jnp.stack([lin_kernel(proj_t.proj[r]) for r in routes], axis=0)
    params["bias"] = jnp.stack([t2j(proj_t.proj[r].bias) for r in routes], axis=0)
    if with_bias:
        params["route_logit_bias"] = t2j(proj_t.route_logit_bias)
    return params


class TestBridgeParity:
    """forward_capsule_from_route_dict (PCA) vs projector+compose_priors+head."""

    @pytest.mark.parametrize("temp,use_mask", [(1.0, False), (2.0, True), (0.7, True)])
    def test_bridge(self, ref, temp, use_mask):
        from multimodalrouting_tpu.routing.capsule_head import (
            CapsuleHead,
            RoutePrimaryProjector,
            compose_priors,
        )

        d_in, pc, mc, k, b = 12, 8, 16, 2, 4
        r = len(ROUTES_10)
        torch.manual_seed(6)
        proj_t = ref.rh_pca.RoutePrimaryProjector(d_in=d_in, pc_dim=pc).eval()
        head_t = _make_pca_head(ref, pc, mc, k, num_routing=3)
        route_embs_t = {name: torch.randn(b, d_in) for name in ROUTES_10}
        rng = np.random.default_rng(7)
        if use_mask:
            mask_np = rng.integers(0, 2, size=(b, r)).astype(np.float32)
            mask_np[:, 0] = 1.0
        else:
            mask_np = np.ones((b, r), dtype=np.float32)
        mask_t = torch.from_numpy(mask_np)

        with torch.no_grad():
            logits_t, prim_acts_t, _, r_t = ref.rh_pca.forward_capsule_from_route_dict(
                route_embs_in=route_embs_t, projector=proj_t, capsule_head=head_t,
                route_mask=mask_t, act_temperature=temp,
            )

        proj_j = RoutePrimaryProjector(routes=tuple(ROUTES_10), d_in=d_in, pc_dim=pc)
        head_j = CapsuleHead(
            num_routes=r, pc_dim=pc, mc_caps_dim=mc, num_classes=k,
            num_routing=3, head_style="rmatrix",
        )
        route_embs_j = {kk: t2j(v) for kk, v in route_embs_t.items()}
        mask_j = jnp.asarray(mask_np)

        pvars = proj_j.init(jax.random.PRNGKey(0), route_embs_j)
        pvars = {"params": _inject_projector(pvars["params"], proj_t, ROUTES_10)}
        poses_j, acts_j = proj_j.apply(pvars, route_embs_j)
        priors = compose_priors(
            acts_j, route_mask=mask_j, act_temperature=temp,
            prior_floor=ref.env10.CFG.route_prior_floor,
            prior_ceiling=ref.env10.CFG.route_prior_ceiling,
        )
        hvars = head_j.init(jax.random.PRNGKey(1), poses_j, priors, route_mask=mask_j)
        hvars = {"params": _inject_capsule_head(hvars["params"], head_t)}
        out = head_j.apply(hvars, poses_j, priors, route_mask=mask_j)

        _assert_close(out.logits, logits_t.numpy(), "bridge logits")
        _assert_close(out.alpha, prim_acts_t.numpy(), "bridge priors")
        _assert_close(out.r_matrix, r_t.numpy(), "bridge R")


# ---------------------------------------------------------------------------
# 3. MULTModel (10-route directional cross-attention builder)
# ---------------------------------------------------------------------------

SELF_STREAMS = [("L", "trans_l"), ("N", "trans_n"), ("I", "trans_i")]
CROSS_STREAMS = [
    ("LN", "trans_l_with_n"),
    ("LI", "trans_l_with_i"),
    ("NL", "trans_n_with_l"),
    ("NI", "trans_n_with_i"),
    ("IL", "trans_i_with_l"),
    ("IN", "trans_i_with_n"),
]


def _encoder_layer_params(layer_t):
    """Reference TransformerEncoderLayer -> flax MulTEncoderLayer params."""
    d = layer_t.embed_dim
    w = t2j(layer_t.self_attn.in_proj_weight)
    bias = t2j(layer_t.self_attn.in_proj_bias)
    return {
        "attn": {
            "q_proj": {"kernel": w[:d].T, "bias": bias[:d]},
            "k_proj": {"kernel": w[d : 2 * d].T, "bias": bias[d : 2 * d]},
            "v_proj": {"kernel": w[2 * d :].T, "bias": bias[2 * d :]},
            "out_proj": {
                "kernel": lin_kernel(layer_t.self_attn.out_proj),
                "bias": t2j(layer_t.self_attn.out_proj.bias),
            },
        },
        "fc1": {"kernel": lin_kernel(layer_t.fc1), "bias": t2j(layer_t.fc1.bias)},
        "fc2": {"kernel": lin_kernel(layer_t.fc2), "bias": t2j(layer_t.fc2.bias)},
        "ln0": {
            "scale": t2j(layer_t.layer_norms[0].weight),
            "bias": t2j(layer_t.layer_norms[0].bias),
        },
        "ln1": {
            "scale": t2j(layer_t.layer_norms[1].weight),
            "bias": t2j(layer_t.layer_norms[1].bias),
        },
    }


def _encoder_params(enc_t):
    out = {f"layer_{i}": _encoder_layer_params(l) for i, l in enumerate(enc_t.layers)}
    out["final_ln"] = {
        "scale": t2j(enc_t.layer_norm.weight),
        "bias": t2j(enc_t.layer_norm.bias),
    }
    return out


def _stack_streams(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def _inject_mult(params, mult_t):
    params = dict(params)
    for name in ("l", "n", "i"):
        conv = getattr(mult_t, f"proj_{name}")
        params[f"proj_{name}"] = {"kernel": t2j(conv.weight)[:, :, 0].T}
    params["self_streams"] = _stack_streams(
        [_encoder_params(getattr(mult_t, attr)) for _, attr in SELF_STREAMS]
    )
    params["cross_streams"] = _stack_streams(
        [_encoder_params(getattr(mult_t, attr)) for _, attr in CROSS_STREAMS]
    )
    for pair in ("ln", "li", "ni"):
        lin = getattr(mult_t, f"proj_pair_{pair}")
        params[f"proj_pair_{pair}"] = {"kernel": lin_kernel(lin), "bias": t2j(lin.bias)}
    params["final_lni"] = {
        "kernel": lin_kernel(mult_t.final_lni),
        "bias": t2j(mult_t.final_lni.bias),
    }
    return params


def _make_ref_mult(ref, orig_d, d, heads, layers, self_layers):
    torch.manual_seed(8)
    return ref.mult_model.MULTModel(
        orig_d_l=orig_d, orig_d_n=orig_d, orig_d_i=orig_d,
        d_l=d, d_n=d, d_i=d, ionly=True, nonly=True, lonly=True,
        num_heads=heads, layers=layers, self_layers=self_layers,
        attn_dropout=0.0, attn_dropout_n=0.0, attn_dropout_i=0.0,
        relu_dropout=0.0, res_dropout=0.0, out_dropout=0.0,
        embed_dropout=0.0, attn_mask=False,
    ).eval()


def _mult_inputs(b, tl, tn, ti, orig_d, seed=9):
    rng = np.random.default_rng(seed)
    x = {
        "L": rng.standard_normal((b, tl, orig_d)).astype(np.float32),
        "N": rng.standard_normal((b, tn, orig_d)).astype(np.float32),
        "I": rng.standard_normal((b, ti, orig_d)).astype(np.float32),
    }
    masks = {}
    for k, t in (("L", tl), ("N", tn), ("I", ti)):
        lengths = rng.integers(1, t + 1, size=(b,))
        m = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)
        masks[k] = m
    return x, masks


class TestMULTParity:
    def test_reference_positions_are_integer_truncated(self, ref):
        """Documents the reference defect that forces positions='ref_quantized'
        in the parity tests below: position_embedding.py:111 casts the float
        sin/cos table to the dtype of the integer dummy ids (torch.long), so
        the runnable reference's positional embeddings are trunc()'d to
        {-1, 0, 1}. Our default 'sinusoidal' mode keeps the correct values."""
        import ref_position_embedding as _  # noqa: F401 — loaded by fixture

        pe = sys.modules["ref_position_embedding"].SinusoidalPositionalEmbedding(8)
        dummy = torch.ones(1, 5, dtype=torch.long)
        table = pe(dummy).numpy()
        assert np.all(table == np.trunc(table)), "defect gone? revisit parity mode"

        from multimodalrouting_tpu.models.attention import sinusoidal_positions

        _assert_close(
            sinusoidal_positions(5, 8, quantized=True), table[0], "quantized table"
        )

    def test_ten_route_outputs(self, ref):
        from multimodalrouting_tpu.models.mult import MULTRouter

        b, tl, tn, ti, orig_d, d, heads = 3, 6, 5, 4, 10, 8, 2
        layers, self_layers = 2, 1
        mult_t = _make_ref_mult(ref, orig_d, d, heads, layers, self_layers)
        x, masks = _mult_inputs(b, tl, tn, ti, orig_d)

        with torch.no_grad():
            out_t = mult_t(
                torch.from_numpy(x["L"]), torch.from_numpy(x["N"]), torch.from_numpy(x["I"]),
                mL=torch.from_numpy(masks["L"]), mN=torch.from_numpy(masks["N"]),
                mI=torch.from_numpy(masks["I"]),
            )

        router = MULTRouter(
            d=d, num_heads=heads, layers=layers, self_layers=self_layers,
            attn_dropout=0.0, attn_dropout_n=0.0, attn_dropout_i=0.0,
            relu_dropout=0.0, res_dropout=0.0, embed_dropout=0.0, attn_mask=False,
            positions="ref_quantized",
        )
        args = (
            jnp.asarray(x["L"]), jnp.asarray(x["N"]), jnp.asarray(x["I"]),
            jnp.asarray(masks["L"]), jnp.asarray(masks["N"]), jnp.asarray(masks["I"]),
        )
        variables = router.init(jax.random.PRNGKey(0), *args)
        variables = {"params": _inject_mult(variables["params"], mult_t)}
        out_j = router.apply(variables, *args)

        assert set(out_j) == set(out_t.keys())
        for route in ROUTES_10:
            _assert_close(
                out_j[route], out_t[route].numpy(), f"route {route}",
                rtol=1e-4, atol=1e-5,
            )


# ---------------------------------------------------------------------------
# 4. End-to-end flagship chain: MULT -> projector -> priors -> capsule
# ---------------------------------------------------------------------------


class TestFlagshipEndToEndParity:
    def test_mult_to_capsule(self, ref):
        from multimodalrouting_tpu.models.mult import MULTRouter
        from multimodalrouting_tpu.routing.capsule_head import (
            CapsuleHead,
            RoutePrimaryProjector,
            compose_priors,
        )

        b, tl, tn, ti, orig_d, d, heads = 2, 6, 5, 4, 10, 8, 2
        pc, mc, k = 6, 12, 2
        mult_t = _make_ref_mult(ref, orig_d, d, heads, layers=1, self_layers=1)
        torch.manual_seed(10)
        proj_t = ref.rh_pca.RoutePrimaryProjector(d_in=d, pc_dim=pc).eval()
        head_t = _make_pca_head(ref, pc, mc, k, num_routing=3)
        x, masks = _mult_inputs(b, tl, tn, ti, orig_d, seed=11)
        mask_np = np.ones((b, len(ROUTES_10)), dtype=np.float32)
        mask_np[1, 4] = 0.0  # drop NL for sample 1

        with torch.no_grad():
            logits_t, prim_acts_t, _, r_t = ref.rh_pca.forward_capsule_from_multmodel(
                mult_t,
                torch.from_numpy(x["L"]), torch.from_numpy(x["N"]), torch.from_numpy(x["I"]),
                proj_t, head_t,
                mL=torch.from_numpy(masks["L"]), mN=torch.from_numpy(masks["N"]),
                mI=torch.from_numpy(masks["I"]),
                route_mask=torch.from_numpy(mask_np), act_temperature=2.0,
            )

        router = MULTRouter(
            d=d, num_heads=heads, layers=1, self_layers=1,
            attn_dropout=0.0, relu_dropout=0.0, res_dropout=0.0,
            embed_dropout=0.0, attn_mask=False, positions="ref_quantized",
        )
        args = (
            jnp.asarray(x["L"]), jnp.asarray(x["N"]), jnp.asarray(x["I"]),
            jnp.asarray(masks["L"]), jnp.asarray(masks["N"]), jnp.asarray(masks["I"]),
        )
        mvars = router.init(jax.random.PRNGKey(0), *args)
        mvars = {"params": _inject_mult(mvars["params"], mult_t)}
        route_embs = router.apply(mvars, *args)

        proj_j = RoutePrimaryProjector(routes=tuple(ROUTES_10), d_in=d, pc_dim=pc)
        pvars = proj_j.init(jax.random.PRNGKey(1), route_embs)
        pvars = {"params": _inject_projector(pvars["params"], proj_t, ROUTES_10)}
        poses, acts = proj_j.apply(pvars, route_embs)

        mask_j = jnp.asarray(mask_np)
        priors = compose_priors(
            acts, route_mask=mask_j, act_temperature=2.0,
            prior_floor=0.02, prior_ceiling=0.98,
        )
        head_j = CapsuleHead(
            num_routes=len(ROUTES_10), pc_dim=pc, mc_caps_dim=mc, num_classes=k,
            num_routing=3, head_style="rmatrix",
        )
        hvars = head_j.init(jax.random.PRNGKey(2), poses, priors, route_mask=mask_j)
        hvars = {"params": _inject_capsule_head(hvars["params"], head_t)}
        out = head_j.apply(hvars, poses, priors, route_mask=mask_j)

        _assert_close(out.logits, logits_t.numpy(), "e2e logits", rtol=1e-4, atol=1e-5)
        _assert_close(out.alpha, prim_acts_t.numpy(), "e2e priors", rtol=1e-4, atol=1e-5)
        _assert_close(out.r_matrix, r_t.numpy(), "e2e R", rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# 5. 7-route MortModel path: linear fusions + biased projector + class-linear
# ---------------------------------------------------------------------------


class TestSevenRouteParity:
    @pytest.mark.parametrize("floor", [0.0, 0.02])
    def test_linear_fusions_and_bridge(self, ref, floor):
        from multimodalrouting_tpu.models.fusions import SevenRouteFusion
        from multimodalrouting_tpu.routing.capsule_head import (
            CapsuleHead,
            RoutePrimaryProjector,
            compose_priors,
        )

        d, pc, mc, b = 10, 6, 12, 4
        torch.manual_seed(12)
        fusion_t = ref.rh_mort.build_fusions(d, p_drop=0.0)
        proj_t = ref.rh_mort.RoutePrimaryProjector(d_in=d, pc_dim=pc).eval()
        head_t = ref.rh_mort.CapsuleMortalityHead(
            pc_dim=pc, mc_caps_dim=mc, num_routing=3, dp=0.0, act_type="EM"
        ).eval()
        # floor > 0 exercises the reference's projector-level floor
        # (MortModel/routing_and_heads.py:209-212) applied BEFORE the bridge
        # temperature — mirrored by RoutePrimaryProjector.prior_floor
        ref.env7.CFG.route_prior_floor = floor
        ref.env7.CFG.route_prior_ceiling = 0.98

        rng = np.random.default_rng(13)
        z = {kk: rng.standard_normal((b, d)).astype(np.float32) for kk in "LNI"}
        z_t = {kk: torch.from_numpy(v) for kk, v in z.items()}

        with torch.no_grad():
            logits_t, prim_acts_t, route_embs_t, coef_t = (
                ref.rh_mort.forward_capsule_from_routes(
                    z_t, fusion_t, proj_t, head_t, act_temperature=2.0
                )
            )

        fusion_j = SevenRouteFusion(
            d=d, bi_fusion_mode="linear", tri_fusion_mode="linear", p_drop=0.0
        )
        fargs = tuple(jnp.asarray(z[kk]) for kk in "LNI")
        fvars = fusion_j.init(jax.random.PRNGKey(0), *fargs)
        fparams = dict(fvars["params"])
        for pair in ("LN", "LI", "NI", "LNI"):
            fparams[pair] = {"Dense_0": {"kernel": lin_kernel(fusion_t[pair].mlp.net)}}
        route_embs_j = fusion_j.apply({"params": fparams}, *fargs)
        for kk in ROUTES_7:
            _assert_close(route_embs_j[kk], route_embs_t[kk].numpy(), f"fusion {kk}")

        proj_j = RoutePrimaryProjector(
            routes=tuple(ROUTES_7), d_in=d, pc_dim=pc, use_route_logit_bias=True,
            prior_floor=floor,
        )
        pvars = proj_j.init(jax.random.PRNGKey(1), route_embs_j)
        pvars = {
            "params": _inject_projector(pvars["params"], proj_t, ROUTES_7, with_bias=True)
        }
        poses, acts = proj_j.apply(pvars, route_embs_j)

        priors = compose_priors(acts, act_temperature=2.0, prior_floor=floor, prior_ceiling=0.98)
        head_j = CapsuleHead(
            num_routes=7, pc_dim=pc, mc_caps_dim=mc, num_classes=2,
            num_routing=3, head_style="class_linear", act_type="EM",
        )
        hvars = head_j.init(jax.random.PRNGKey(2), poses, priors)
        hparams = dict(hvars["params"])
        hparams["w"] = t2j(head_t.mc.w)
        hparams["cls_kernel"] = jnp.stack(
            [t2j(head_t.cls0.weight)[0], t2j(head_t.cls1.weight)[0]], axis=0
        )
        hparams["cls_bias"] = jnp.concatenate(
            [t2j(head_t.cls0.bias), t2j(head_t.cls1.bias)]
        )
        out = head_j.apply({"params": hparams}, poses, priors)

        _assert_close(out.logits, logits_t.numpy(), "7-route logits")
        _assert_close(out.alpha, prim_acts_t.numpy(), "7-route priors")
        _assert_close(out.coef, coef_t.numpy(), "7-route coefficients")
