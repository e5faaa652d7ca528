"""Golden parity for the gated-concat and sMRO paths against the reference's
own torch modules (extends tests/test_reference_parity.py, which covers the
capsule/MULT flagship).

Loaded reference code:
  * MIMIC-IV/Model/routing_and_heads.py — PairwiseFusion/TrimodalFusion
    (rich features), RouteGateNet, FinalConcatHead, concat_routes,
    route_availability_mask (:38-353)
  * routing.py (repo root) — MMRouting trainable sMRO gate (:21-176)
Identical weights are injected into the flax modules and outputs asserted
allclose at fp32.
"""
from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os

REF = Path(os.environ.get("MMR_REFERENCE_ROOT", "/root/reference"))

pytestmark = [
    pytest.mark.slow,  # loads the torch reference modules
    pytest.mark.skipif(not REF.exists(), reason="reference checkout not available"),
]
ROUTES_7 = ("L", "N", "I", "LN", "LI", "NI", "LNI")


def _load(path: Path, name: str, deps: dict):
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
    torch.manual_seed(0)
    env = types.ModuleType("env_config")
    env.ROUTES = list(ROUTES_7)
    env.DEVICE = "cpu"
    env.CFG = types.SimpleNamespace(verbose=False)
    encoders_stub = types.ModuleType("encoders")
    encoders_stub.EncoderConfig = object
    encoders_stub.build_encoders = lambda *a, **k: None
    rh_model = _load(
        REF / "MIMIC-IV/Model/routing_and_heads.py",
        "ref_rh_model",
        {"env_config": env, "encoders": encoders_stub},
    )
    routing = _load(REF / "routing.py", "ref_routing", {})
    return types.SimpleNamespace(rh=rh_model, routing=routing)


def t2j(x):
    return jnp.asarray(x.detach().cpu().numpy().astype(np.float32))


def lin(linear):
    return {"kernel": t2j(linear.weight).T, "bias": t2j(linear.bias)}


def ln(norm):
    return {"scale": t2j(norm.weight), "bias": t2j(norm.bias)}


def mlp_params(seq):
    """Reference _MLP Sequential -> our MLPBlock param dict.

    Layout per hidden layer: [LN, Linear, GELU, Dropout]; tail [LN, Linear].
    """
    mods = list(seq)
    out = {}
    n_hidden = (len(mods) - 2) // 4
    for i in range(n_hidden):
        out[f"ln_{i}"] = ln(mods[4 * i])
        out[f"fc_{i}"] = lin(mods[4 * i + 1])
    out["ln_out"] = ln(mods[-2])
    out["fc_out"] = lin(mods[-1])
    return out


def _assert_close(a, b, name, rtol=1e-4, atol=1e-4):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol, err_msg=name)


class TestRichFusionParity:
    def test_pairwise_rich(self, ref):
        from multimodalrouting_tpu.models.fusions import PairwiseFusion

        d, b = 24, 6
        tf = ref.rh.PairwiseFusion(d=d, feature_mode="rich").eval()
        rng = np.random.default_rng(0)
        za = rng.standard_normal((b, d)).astype(np.float32)
        zb = rng.standard_normal((b, d)).astype(np.float32)
        with torch.no_grad():
            want = tf(torch.tensor(za), torch.tensor(zb)).numpy()

        jf = PairwiseFusion(d=d, feature_mode="rich")
        params = {
            "mlp": mlp_params(tf.mlp.net),
            "res_scale": t2j(tf.res_scale),
        }
        got = jf.apply({"params": params}, jnp.asarray(za), jnp.asarray(zb))
        _assert_close(got, want, "pairwise rich fusion")

    def test_trimodal_rich(self, ref):
        from multimodalrouting_tpu.models.fusions import TrimodalFusion

        d, b = 16, 5
        tf = ref.rh.TrimodalFusion(d=d, feature_mode="rich").eval()
        # reference defect: __init__ never stores feature_mode, so forward
        # raises AttributeError as written (same defect family as SURVEY
        # §2.5's CrossAttnBlock NameError); patch the attribute to make the
        # reference runnable
        tf.feature_mode = "rich"
        rng = np.random.default_rng(1)
        zs = [rng.standard_normal((b, d)).astype(np.float32) for _ in range(3)]
        with torch.no_grad():
            want = tf(*(torch.tensor(z) for z in zs)).numpy()

        jf = TrimodalFusion(d=d, feature_mode="rich")
        params = {"mlp": mlp_params(tf.mlp.net), "res_scale": t2j(tf.res_scale)}
        got = jf.apply({"params": params}, *(jnp.asarray(z) for z in zs))
        _assert_close(got, want, "trimodal rich fusion")


class TestGateAndHeadParity:
    def test_route_gate_net_with_availability(self, ref):
        from multimodalrouting_tpu.routes import route_mask_from_presence
        from multimodalrouting_tpu.routing.gates import RouteGateNet

        d, b = 24, 8
        tg = ref.rh.RouteGateNet(d=d, hidden=64).eval()
        rng = np.random.default_rng(2)
        zl, zn, zi = (rng.standard_normal((b, d)).astype(np.float32) for _ in range(3))
        has = [rng.random(b) > 0.3 for _ in range(3)]
        masks = {
            k: torch.tensor(h.astype(np.float32)).unsqueeze(1)
            for k, h in zip("LNI", has)
        }
        with torch.no_grad():
            want = tg(
                {"L": torch.tensor(zl), "N": torch.tensor(zn), "I": torch.tensor(zi)},
                masks=masks,
            ).numpy()

        jg = RouteGateNet(num_routes=7, hidden=64)
        mods = list(tg.net)
        params = {"ln": ln(mods[0]), "fc1": lin(mods[1]), "fc2": lin(mods[4])}
        avail = route_mask_from_presence(
            jnp.asarray(has[0].astype(np.float32)),
            jnp.asarray(has[1].astype(np.float32)),
            jnp.asarray(has[2].astype(np.float32)),
            ROUTES_7,
        )
        got = jg.apply(
            {"params": params}, jnp.asarray(zl), jnp.asarray(zn), jnp.asarray(zi), avail=avail
        )
        _assert_close(got, want, "route gate net")

    def test_availability_mask_algebra(self, ref):
        from multimodalrouting_tpu.routes import route_mask_from_presence

        rng = np.random.default_rng(3)
        b = 16
        has = [(rng.random(b) > 0.4).astype(np.float32) for _ in range(3)]
        masks = {k: torch.tensor(h).unsqueeze(1) for k, h in zip("LNI", has)}
        want = ref.rh.route_availability_mask(masks, b, "cpu").numpy()
        got = route_mask_from_presence(*(jnp.asarray(h) for h in has), ROUTES_7)
        _assert_close(got, want, "route availability mask")

    def test_concat_routes_and_final_head(self, ref):
        from multimodalrouting_tpu.routing.gates import FinalConcatHead, concat_routes

        d, b = 12, 6
        th = ref.rh.FinalConcatHead(d=d, n_tasks=1).eval()
        rng = np.random.default_rng(4)
        embs_np = {r: rng.standard_normal((b, d)).astype(np.float32) for r in ROUTES_7}
        gates_np = rng.random((b, 7)).astype(np.float32)
        gates_np /= gates_np.sum(1, keepdims=True)

        t_embs = {r: torch.tensor(v) for r, v in embs_np.items()}
        with torch.no_grad():
            x_cat_t, zw_t = ref.rh.concat_routes(t_embs, torch.tensor(gates_np), l2norm=True)
            want = th(x_cat_t).numpy()

        x_cat, zw = concat_routes(
            {r: jnp.asarray(v) for r, v in embs_np.items()},
            jnp.asarray(gates_np),
            ROUTES_7,
            l2norm=True,
        )
        _assert_close(x_cat, x_cat_t.numpy(), "concat_routes x_cat")
        _assert_close(zw, zw_t.numpy(), "concat_routes weighted")

        jh = FinalConcatHead(num_routes=7, d=d, n_tasks=1)
        got = jh.apply({"params": {"mlp": mlp_params(th.mlp)}}, x_cat)
        _assert_close(got, want, "final concat head")


class TestMMRoutingParity:
    @pytest.mark.parametrize("stage", [None, "uni", "bi", "tri"])
    def test_fused_and_weights(self, ref, stage):
        from multimodalrouting_tpu.routing.smro import MMRouting

        d, b, c = 18, 5, 3
        tm = ref.routing.MMRouting(feat_dim=3 * d, gate_hidden=32).eval()
        rng = np.random.default_rng(5)
        rl = rng.standard_normal((b, 7, c)).astype(np.float32)
        zl, zn, zi = (rng.standard_normal((b, d)).astype(np.float32) for _ in range(3))
        with torch.no_grad():
            fused_t, rw_t, bw_t = tm(
                torch.tensor(rl), torch.tensor(zl), torch.tensor(zn), torch.tensor(zi),
                stage=stage,
            )

        jm = MMRouting(routes=ROUTES_7, gate_hidden=32)

        def gate_params(seq):
            mods = list(seq)
            return ln(mods[0]), lin(mods[1]), lin(mods[4])

        rg_ln, rg_fc1, rg_fc2 = gate_params(tm.route_gate)
        bg_ln, bg_fc1, bg_fc2 = gate_params(tm.block_gate)
        params = {
            "route_gate_ln": rg_ln, "route_gate_fc1": rg_fc1, "route_gate_fc2": rg_fc2,
            "block_gate_ln": bg_ln, "block_gate_fc1": bg_fc1, "block_gate_fc2": bg_fc2,
        }
        out = jm.apply(
            {"params": params},
            jnp.asarray(rl), jnp.asarray(zl), jnp.asarray(zn), jnp.asarray(zi),
            stage=stage,
        )
        _assert_close(out.fused, fused_t.numpy(), f"fused[{stage}]")
        _assert_close(out.route_w, rw_t.numpy(), f"route_w[{stage}]")
        _assert_close(out.block_w, bw_t.numpy(), f"block_w[{stage}]")


@pytest.fixture(scope="module")
def ref_partial():
    """Partial/Cross_Attention lightweight fusions (reference :66-249)."""
    torch.manual_seed(0)
    env = types.ModuleType("env_config")
    env.ROUTES = ["L", "N", "I", "LN", "NL", "LI", "IL", "NI", "IN", "LNI"]
    env.DEVICE = "cpu"
    env.CFG = types.SimpleNamespace(verbose=False)
    caps = _load(REF / "MIMIC-IV/MortModel/capsule_layers.py", "ref_caps_pcx", {})
    return _load(
        REF / "MIMIC-IV/PhenoModel/Partial/Cross_Attention/routing_and_heads.py",
        "ref_rh_partial",
        {"env_config": env, "capsule_layers": caps},
    )


def mha_params(attn):
    """torch nn.MultiheadAttention (packed in_proj) -> our MultiheadAttention."""
    d = attn.embed_dim
    w = attn.in_proj_weight.detach().numpy()
    b = attn.in_proj_bias.detach().numpy()
    return {
        "q_proj": {"kernel": jnp.asarray(w[:d].T), "bias": jnp.asarray(b[:d])},
        "k_proj": {"kernel": jnp.asarray(w[d : 2 * d].T), "bias": jnp.asarray(b[d : 2 * d])},
        "v_proj": {"kernel": jnp.asarray(w[2 * d :].T), "bias": jnp.asarray(b[2 * d :])},
        "out_proj": lin(attn.out_proj),
    }


class TestPartialCrossAttnFusionParity:
    @pytest.mark.parametrize("pool", ["mean", "first"])
    def test_directional_fusion(self, ref_partial, pool):
        from multimodalrouting_tpu.models.fusions import DirectionalCrossAttnFusion

        d, b, ta, tb = 16, 6, 5, 7
        tf = ref_partial.CrossAttentionFusion(d=d, n_heads=4, pool=pool).eval()
        rng = np.random.default_rng(7)
        a = rng.standard_normal((b, ta, d)).astype(np.float32)
        bb = rng.standard_normal((b, tb, d)).astype(np.float32)
        # ragged masks; B kept non-empty (the reference's torch MHA emits NaN
        # rows for fully-masked samples — behavioral divergence we do not copy)
        ma = (rng.random((b, ta)) > 0.3).astype(np.float32)
        ma[:, 2] = 1.0
        ma[0, :2] = 0.0  # exercises first-VALID pooling
        mb = (rng.random((b, tb)) > 0.3).astype(np.float32)
        mb[:, 0] = 1.0
        with torch.no_grad():
            want = tf(
                torch.tensor(a), torch.tensor(ma), torch.tensor(bb), torch.tensor(mb)
            ).numpy()

        jf = DirectionalCrossAttnFusion(d=d, n_heads=4, pool=pool, p_drop=0.0)
        params = {
            "attn": mha_params(tf.attn),
            "post_ln": ln(tf.ln1),
            "ff1": lin(tf.ff[0]),
            "ff2": lin(tf.ff[2]),
            "out_ln": ln(tf.ln2),
            "out_proj_ln": ln(tf.out[0]),
            "out_proj_fc": lin(tf.out[1]),
        }
        got = jf.apply(
            {"params": params}, jnp.asarray(a), jnp.asarray(ma), jnp.asarray(bb), jnp.asarray(mb)
        )
        _assert_close(got, want, f"directional fusion pool={pool}")

    def test_tri_token_fusion(self, ref_partial):
        from multimodalrouting_tpu.models.fusions import TriTokenAttentionFusion

        d, b = 16, 5
        tf = ref_partial.TriTokenAttentionFusion(d=d, n_heads=4).eval()
        rng = np.random.default_rng(8)
        seqs = [rng.standard_normal((b, t, d)).astype(np.float32) for t in (4, 6, 3)]
        masks = [(rng.random((b, t)) > 0.3).astype(np.float32) for t in (4, 6, 3)]
        masks[0][:, 0] = 1.0
        with torch.no_grad():
            want = tf(
                torch.tensor(seqs[0]), torch.tensor(masks[0]),
                torch.tensor(seqs[1]), torch.tensor(masks[1]),
                torch.tensor(seqs[2]), torch.tensor(masks[2]),
            ).numpy()

        jf = TriTokenAttentionFusion(d=d, n_heads=4, p_drop=0.0)
        params = {
            "query": t2j(tf.q),
            "attn": mha_params(tf.attn),
            "ln_kv": ln(tf.ln_kv),
            "out_proj_ln": ln(tf.out[0]),
            "out_proj_fc": lin(tf.out[1]),
        }
        args = []
        for s, m in zip(seqs, masks):
            args += [jnp.asarray(s), jnp.asarray(m)]
        got = jf.apply({"params": params}, *args)
        _assert_close(got, want, "tri token fusion")

    def test_route_mask_10(self, ref_partial):
        from multimodalrouting_tpu.routes import ROUTES_10, route_mask_from_presence

        rng = np.random.default_rng(9)
        b = 12
        has = [(rng.random(b) > 0.4).astype(np.float32) for _ in range(3)]
        want = ref_partial.build_route_mask_from_presence(
            torch.tensor(has[0]), torch.tensor(has[1]), torch.tensor(has[2])
        ).numpy()
        got = route_mask_from_presence(*(jnp.asarray(h) for h in has), ROUTES_10)
        _assert_close(got, want, "route mask 10")


@pytest.fixture(scope="module")
def ref_encoders():
    env = types.ModuleType("env_config")
    env.DEVICE = "cpu"
    env.CFG = types.SimpleNamespace(verbose=False)
    return _load(
        REF / "MIMIC-IV/MortModel/Paired_Cross_Attention/encoders.py",
        "ref_encoders_pcx",
        {"env_config": env},
    )


class TestBEHRTParity:
    @pytest.mark.parametrize("pool", ["cls", "mean", "last"])
    def test_encode_seq_and_pool(self, ref_encoders, pool):
        from multimodalrouting_tpu.models.behrt import BEHRTLabEncoder

        torch.manual_seed(3)
        f, d, t, b = 17, 32, 12, 5
        te = ref_encoders.BEHRTLabEncoder(
            n_feats=f, d=d, seq_len=t, n_layers=2, n_heads=4, pool=pool
        ).eval()
        rng = np.random.default_rng(10)
        x = rng.standard_normal((b, t, f)).astype(np.float32)
        mask = (rng.random((b, t)) > 0.25).astype(np.float32)
        mask[:, 0] = 1.0
        with torch.no_grad():
            seq_t, mask_t, pool_t = te.encode_seq_and_pool(
                torch.tensor(x), torch.tensor(mask)
            )

        je = BEHRTLabEncoder(n_feats=f, d=d, seq_len=t, n_layers=2, n_heads=4, pool=pool)
        params = {
            "input_proj": lin(te.input_proj),
            "pos": t2j(te.pos),
            "out_ln": ln(te.out[0]),
            "out_proj": lin(te.out[1]),
        }
        if pool == "cls":
            params["cls_token"] = t2j(te.cls_token)
        for i, layer in enumerate(te.enc.layers):
            params[f"layer_{i}"] = {
                "attn": mha_params(layer.self_attn),
                "fc1": lin(layer.linear1),
                "fc2": lin(layer.linear2),
                "ln1": ln(layer.norm1),
                "ln2": ln(layer.norm2),
            }
        seq_j, mask_j, pool_j = je.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(mask)
        )
        _assert_close(seq_j, seq_t.numpy(), f"behrt seq pool={pool}")
        _assert_close(mask_j, mask_t.numpy(), "behrt mask")
        _assert_close(pool_j, pool_t.numpy(), f"behrt pooled pool={pool}")


class TestSigmoidGateCapsuleParity:
    @pytest.mark.parametrize("gate_cfg", [(1.0, 0.0, 1.0), (2.5, 0.1, 0.9)])
    def test_sigmoid_routing_iterations(self, gate_cfg):
        """Sigmoid-gate anti-collapse CapsuleFC (capsule_atten.py:7-257):
        independent per-(route,label) sigmoid gates + scale-norm, primary
        acts re-tempered/clamped in logit space."""
        gate_temp, gate_min, gate_max = gate_cfg
        caps_atten = _load(
            REF / "MIMIC-IV/PhenoModel/capsule_atten.py", "ref_capsule_atten", {}
        )
        torch.manual_seed(4)
        b, n, a, m, d = 5, 7, 16, 25, 32
        tc = caps_atten.CapsuleFC(
            in_n_capsules=n, in_d_capsules=a, out_n_capsules=m, out_d_capsules=d,
            n_rank=0, act_type="ONES",
            gate_temp=gate_temp, gate_min=gate_min, gate_max=gate_max,
        ).eval()

        rng = np.random.default_rng(11)
        pose = rng.standard_normal((b, n, a)).astype(np.float32)
        act = rng.uniform(0.05, 0.95, (b, n)).astype(np.float32)

        num_iters = 3
        with torch.no_grad():
            tp, ta, tw = torch.tensor(pose), torch.tensor(act), None
            next_pose = next_act = None
            for i in range(num_iters):
                next_pose, next_act, qk = tc(
                    tp, ta, i, next_capsule_value=next_pose, next_act=next_act
                )
        want_pose, want_act, want_coef = next_pose.numpy(), next_act.numpy(), qk.numpy()

        from multimodalrouting_tpu.ops.capsule import capsule_routing

        got = capsule_routing(
            jnp.asarray(pose), jnp.asarray(act), t2j(tc.w), num_iters,
            mode="sigmoid_routes", act_type="ONES",
            gate_temp=gate_temp, gate_min=gate_min, gate_max=gate_max,
        )
        _assert_close(got.pose, want_pose, "sigmoid capsule pose", rtol=1e-5, atol=1e-5)
        _assert_close(got.act, want_act, "sigmoid capsule act", rtol=1e-6, atol=1e-6)
        _assert_close(got.coef, want_coef, "sigmoid capsule coef", rtol=1e-5, atol=1e-6)


class TestMedFuseDiscretizerParity:
    @pytest.mark.parametrize("impute", ["zero", "normal_value", "previous", "next"])
    def test_transform_matches_reference(self, tmp_path, impute):
        """MedFuse Discretizer (MedFuse_Preprocessing/ehr_utils/
        preprocessing.py:11-177): bin/impute/one-hot/mask-append parity."""
        import json as _json

        cfg = {
            "id_to_channel": ["Heart Rate", "GCS", "Mean BP"],
            "is_categorical_channel": {"Heart Rate": False, "GCS": True, "Mean BP": False},
            "possible_values": {"Heart Rate": [], "GCS": ["3", "8", "15"], "Mean BP": []},
            "normal_values": {"Heart Rate": "86", "GCS": "15", "Mean BP": "77"},
        }
        cfg_path = tmp_path / "channels.json"
        cfg_path.write_text(_json.dumps(cfg))

        ref_pre = _load(
            REF / "MedFuse_Preprocessing/ehr_utils/preprocessing.py",
            "ref_medfuse_pre",
            {},
        )
        rng = np.random.default_rng(12)
        rows = []
        t = 0.0
        for _ in range(30):
            t += float(rng.uniform(0.1, 1.2))
            hr = f"{rng.uniform(50, 120):.1f}" if rng.random() > 0.3 else ""
            gcs = str(rng.choice(["3", "8", "15"])) if rng.random() > 0.5 else ""
            mbp = f"{rng.uniform(60, 110):.1f}" if rng.random() > 0.4 else ""
            rows.append([f"{t:.3f}", hr, gcs, mbp])

        td = ref_pre.Discretizer(
            timestep=1.0, store_masks=True, impute_strategy=impute,
            start_time="zero", config_path=str(cfg_path),
        )
        want, want_header = td.transform(rows, end=24.0)

        from multimodalrouting_tpu.data.medfuse import Discretizer

        jd = Discretizer(
            timestep=1.0, store_masks=True, impute_strategy=impute,
            start_time="zero", config=cfg,
        )
        got, got_header = jd.transform(rows, end=24.0)
        np.testing.assert_allclose(got, np.asarray(want, np.float32), rtol=1e-6, atol=1e-6)


class TestNoteEncoderParity:
    @pytest.mark.parametrize("ref_agg", ["mean", "max"])
    def test_chunk_bert_encoder_vs_reference(self, ref_agg):
        """Batched-3D chunk note encoder (PhenoModel/encoder_atten.py:181-297)
        against a REAL HF BertModel (random-initialized from config, no
        download), exercising import_hf_bert_params on genuine HF weights.

        Reference defect (SURVEY §2.5): its agg branch labels are swapped —
        agg='mean' executes masked MAX over chunks and vice versa. Our
        chunk_agg names mean what they say, so the expectation maps
        ref_agg='mean' -> chunk_agg='max' and ref_agg='max' -> chunk_agg='mean'.
        """
        transformers = pytest.importorskip("transformers")
        from transformers import BertConfig, BertModel

        hf_cfg = BertConfig(
            vocab_size=200, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        torch.manual_seed(5)
        bert = BertModel(hf_cfg).eval()

        env = types.ModuleType("env_config")
        env.DEVICE = "cpu"
        env.CFG = types.SimpleNamespace(verbose=False, note_agg=ref_agg)
        auto_stub = types.SimpleNamespace(from_pretrained=lambda *_a, **_k: bert)
        # transformers' lazy root module REPLACES itself in sys.modules once
        # submodules load, so patch the live sys.modules entry, not the stale
        # object a top-level `import transformers` captured
        live = sys.modules["transformers"]
        saved = live.AutoModel
        live.AutoModel = auto_stub  # reference calls AutoModel.from_pretrained
        try:
            ref_enc_mod = _load(
                REF / "MIMIC-IV/PhenoModel/encoder_atten.py", "ref_encoder_atten", {"env_config": env}
            )
            te = ref_enc_mod.BioClinBERTEncoder(d=16, agg=ref_agg).eval()
        finally:
            live.AutoModel = saved

        rng = np.random.default_rng(13)
        b, s, l = 3, 4, 20  # noqa: E741
        ids = rng.integers(4, 200, size=(b, s, l))
        chunk_counts = np.array([1, 3, 4])
        chunk_mask = (np.arange(s)[None, :] < chunk_counts[:, None]).astype(np.float32)
        attn = np.ones((b, s, l), np.int64) * chunk_mask[:, :, None].astype(np.int64)
        ids = ids * attn
        with torch.no_grad():
            seq_t, mask_t, pool_t = te.encode_seq_and_pool(
                torch.tensor(ids), torch.tensor(attn), torch.tensor(chunk_mask)
            )

        from multimodalrouting_tpu.models.clinbert import (
            BioClinBERTEncoder,
            import_hf_bert_params,
        )

        our_chunk_agg = {"mean": "max", "max": "mean"}[ref_agg]
        je = BioClinBERTEncoder(
            d=16, note_agg="cls", chunk_agg=our_chunk_agg, finetune_text=True,
            vocab_size=200, hidden=32, layers=2, heads=2, intermediate=64,
            max_position=64,
        )
        bert_params = import_hf_bert_params(bert.state_dict(), layers=2)
        params = {
            "bert": bert_params,
            "proj_ln": ln(te.proj[0]),
            "proj": {"kernel": t2j(te.proj[1].weight).T},
        }
        notes = {
            "input_ids": jnp.asarray(ids, jnp.int32),
            "attention_mask": jnp.asarray(attn, jnp.int32),
            "chunk_mask": jnp.asarray(chunk_mask),
        }
        seq_j, mask_j, pool_j = je.apply({"params": params}, notes)

        # our seq zeroes pad chunks; the reference leaves BERT(pad) values —
        # compare on valid chunks only (downstream consumers mask them anyway)
        _assert_close(
            np.asarray(seq_j),
            seq_t.numpy() * chunk_mask[:, :, None],
            f"note seq ref_agg={ref_agg}",
        )
        _assert_close(mask_j, mask_t.numpy(), "note chunk mask")
        _assert_close(pool_j, pool_t.numpy(), f"note pooled ref_agg={ref_agg}")
