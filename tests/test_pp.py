"""GPipe pipeline parallelism over the BERT layer stack (parallel/pp.py).

Covers: param layout converters, functional-layer numerics vs the flax
BertLayer, pipeline-vs-sequential forward and gradient parity on a virtual
mesh, the BioClinBERTEncoder pipeline layout end-to-end, the train_model
product path (`train.pipeline_parallel=true`), cross-layout checkpoint
restore, and the loud validation rules.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalrouting_tpu.parallel import pp
from multimodalrouting_tpu.parallel.mesh import (
    MODEL_AXIS,
    get_active_mesh,
    make_mesh,
    set_active_mesh,
    set_pp_mode,
)
from tests.helpers import tiny_batch, tiny_config

pytestmark = pytest.mark.dist  # multi-device/multi-process tier (see pytest.ini)

L_LAYERS, HID, HEADS, INTER = 4, 32, 4, 64
N_CHUNKS, SEQ = 16, 12


@pytest.fixture
def mesh24():
    mesh = make_mesh(n_data=2, n_model=4)
    set_active_mesh(mesh)
    set_pp_mode(True)
    yield mesh
    set_active_mesh(None)
    set_pp_mode(False)


def _rand_stacked(rng, layers=L_LAYERS, h=HID, inter=INTER):
    def mk(*s, scale=0.1):
        return jnp.asarray(rng.normal(size=s, scale=scale), jnp.float32)

    return {
        "q_kernel": mk(layers, h, h), "q_bias": mk(layers, h),
        "k_kernel": mk(layers, h, h), "k_bias": mk(layers, h),
        "v_kernel": mk(layers, h, h), "v_bias": mk(layers, h),
        "o_kernel": mk(layers, h, h), "o_bias": mk(layers, h),
        "attn_ln_scale": jnp.ones((layers, h)), "attn_ln_bias": jnp.zeros((layers, h)),
        "i_kernel": mk(layers, h, inter), "i_bias": mk(layers, inter),
        "f_kernel": mk(layers, inter, h), "f_bias": mk(layers, h),
        "ln_scale": jnp.ones((layers, h)), "ln_bias": jnp.zeros((layers, h)),
    }


def _inputs(rng, n=N_CHUNKS, seq=SEQ, h=HID):
    x = jnp.asarray(rng.normal(size=(n, seq, h)), jnp.float32)
    mask = jnp.asarray((rng.random((n, seq)) > 0.2).astype(np.float32))
    return x, mask.at[:, 0].set(1.0)


def test_stack_unstack_roundtrip():
    rng = np.random.default_rng(0)
    stacked = _rand_stacked(rng)
    layered = pp.unstack_bert_layer_params(stacked)
    assert set(layered) == {f"layer_{i}" for i in range(L_LAYERS)}
    back = pp.stack_bert_layer_params(layered, L_LAYERS)
    for k in stacked:
        np.testing.assert_array_equal(np.asarray(stacked[k]), np.asarray(back[k]))


def test_layout_converters_pass_non_layer_keys():
    rng = np.random.default_rng(0)
    stacked = _rand_stacked(rng)
    bert = dict(pp.unstack_bert_layer_params(stacked))
    bert["word_embeddings"] = {"embedding": jnp.zeros((7, HID))}
    as_pp = pp.to_pp_layout(bert)
    assert "word_embeddings" in as_pp and "pp_layers" in as_pp
    assert "layer_0" not in as_pp
    round_tripped = pp.from_pp_layout(as_pp)
    assert "word_embeddings" in round_tripped and "layer_0" in round_tripped


@pytest.mark.parametrize("gelu", ["erf", "tanh", "poly"])
def test_layer_fwd_matches_flax_bert_layer(gelu):
    """bert_layer_fwd (the pipeline's functional layer) == BertLayer.apply,
    under all three FFN activations (encoder.bert_gelu)."""
    from multimodalrouting_tpu.models.clinbert import BertLayer

    rng = np.random.default_rng(1)
    x, mask = _inputs(rng, n=6)
    layer = BertLayer(hidden=HID, heads=HEADS, intermediate=INTER, gelu=gelu)
    params = layer.init(jax.random.PRNGKey(0), x, mask)["params"]
    ref = layer.apply({"params": params}, x, mask)
    got = pp.bert_layer_fwd(
        pp.layer_leaves_from_module(params),
        x,
        mask,
        heads=HEADS,
        dtype=jnp.float32,
        gelu=gelu,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pipeline_forward_matches_sequential(mesh24, n_micro):
    rng = np.random.default_rng(2)
    w = _rand_stacked(rng)
    x, mask = _inputs(rng)
    seq = pp._scan_layers(w, x, mask, heads=HEADS, dtype=jnp.float32)
    pipe = jax.jit(
        lambda w, x, m: pp.pipeline_apply(
            w, x, m, mesh=mesh24, n_micro=n_micro, heads=HEADS, dtype=jnp.float32
        )
    )(w, x, mask)
    np.testing.assert_allclose(np.asarray(pipe), np.asarray(seq), atol=1e-5, rtol=1e-5)


def test_pipeline_handles_chunk_count_not_divisible_by_data_shards(mesh24):
    """N=9 chunks on a 2-data-shard mesh: the pipeline pads and unpads."""
    rng = np.random.default_rng(5)
    w = _rand_stacked(rng)
    x, mask = _inputs(rng, n=9)
    seq = pp._scan_layers(w, x, mask, heads=HEADS, dtype=jnp.float32)
    pipe = jax.jit(
        lambda w, x, m: pp.pipeline_apply(
            w, x, m, mesh=mesh24, n_micro=4, heads=HEADS, dtype=jnp.float32
        )
    )(w, x, mask)
    assert pipe.shape == seq.shape
    np.testing.assert_allclose(np.asarray(pipe), np.asarray(seq), atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential(mesh24):
    """d loss / d weights through the GPipe schedule == through lax.scan.

    k_bias is excluded from the relative check: softmax is invariant to a
    constant shift of the key projections, so its true gradient is exactly
    zero and both sides return numerical noise.
    """
    rng = np.random.default_rng(3)
    w = _rand_stacked(rng)
    x, mask = _inputs(rng)
    r = jnp.asarray(rng.normal(size=(HID,)), jnp.float32)

    def loss_seq(w):
        return jnp.sum(jnp.tanh(pp._scan_layers(w, x, mask, heads=HEADS, dtype=jnp.float32) @ r) ** 2)

    def loss_pipe(w):
        return jnp.sum(
            jnp.tanh(
                pp.pipeline_apply(w, x, mask, mesh=mesh24, n_micro=4, heads=HEADS, dtype=jnp.float32) @ r
            )
            ** 2
        )

    g_seq = jax.grad(loss_seq)(w)
    g_pipe = jax.jit(jax.grad(loss_pipe))(w)
    for k in w:
        a, b = np.asarray(g_seq[k]), np.asarray(g_pipe[k])
        if k == "k_bias":
            assert np.abs(b).max() < 1e-5  # mathematically zero
            continue
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert err < 1e-4, f"grad mismatch on {k}: {err}"


def test_bioclinbert_pipeline_layout_matches_layered():
    """The pipeline param layout reproduces the layered encoder's outputs
    (sequential fallback, no mesh) when fed converted weights — a PP-trained
    checkpoint must score identically on a single chip."""
    from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder

    kw = dict(
        d=16, vocab_size=128, hidden=HID, layers=2, heads=HEADS,
        intermediate=INTER, max_position=SEQ,
    )
    layered = BioClinBERTEncoder(**kw)
    piped = BioClinBERTEncoder(pipeline=True, **kw)
    rng = np.random.default_rng(4)
    notes = {
        "input_ids": jnp.asarray(rng.integers(0, 128, (3, 2, SEQ)), jnp.int32),
        "attention_mask": jnp.ones((3, 2, SEQ), jnp.int32),
        "chunk_mask": jnp.ones((3, 2), jnp.float32),
    }
    p_l = layered.init(jax.random.PRNGKey(0), notes)["params"]
    p_p = dict(p_l)
    p_p["bert"] = pp.to_pp_layout(p_l["bert"])
    h_l, _, pool_l = layered.apply({"params": p_l}, notes)
    h_p, _, pool_p = piped.apply({"params": p_p}, notes)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_l), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pool_p), np.asarray(pool_l), atol=3e-5, rtol=1e-4)


def _pp_cfg(**extra):
    over = {
        "encoder.bert_layers": 2,
        "model.routes": "10",
        "model.num_classes": 2,
        "train.num_data_shards": 2,
        "train.num_model_shards": 2,
        "train.pipeline_parallel": True,
        "train.batch_size": 4,
        "train.epochs": 1,
        "train.use_ema": False,
        "train.sampler_mode": "none",
        "train.route_dropout_p": 0.0,
    }
    over.update(extra)
    return tiny_config(**over)


@pytest.mark.slow
def test_train_model_pipeline_parallel_end_to_end(tmp_path):
    """`train.pipeline_parallel=true` trains through the product path on a
    2x2 mesh: finite loss, checkpoint written, stacked layer axis sharded
    over 'model' at the end (GSPMD must not silently re-replicate)."""
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import train_model

    cfg = _pp_cfg()
    model = CapsuleRoutingModel(cfg=cfg)
    res = train_model(
        cfg, model, tiny_batch(n=8, seed=0), tiny_batch(n=4, seed=1),
        family="capsule", log_fn=lambda s: None, ckpt_dir=str(tmp_path),
    )
    assert get_active_mesh() is None
    assert np.isfinite(res.history[-1]["train_loss"])
    assert (tmp_path / "final.msgpack").exists()
    leaf = res.state.params["encoders"]["bbert"]["bert"]["pp_layers"]["q_kernel"]
    spec = getattr(leaf.sharding, "spec", None)
    if spec is not None:
        assert MODEL_AXIS in str(spec), f"layer axis not staged: {spec}"


@pytest.mark.slow
def test_pp_checkpoint_cross_layout_restore(tmp_path):
    """A layered (replicated-era) checkpoint warm-starts a pipeline-parallel
    state and vice versa (ckpt._convert_bert_layouts)."""
    from multimodalrouting_tpu.ckpt import restore_checkpoint, save_checkpoint
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.state import create_train_state

    cfg_layered = _pp_cfg(**{
        "train.pipeline_parallel": False,
        "train.num_data_shards": 1,
        "train.num_model_shards": 1,
    })
    # cfg_pp keeps pipeline_parallel=True but no mesh: the stacked-layout
    # model runs the sequential fallback on one device
    cfg_pp = _pp_cfg(**{"train.num_data_shards": 1, "train.num_model_shards": 1})

    batch = tiny_batch(n=4, seed=0)
    m_l = CapsuleRoutingModel(cfg=cfg_layered)
    v_l = m_l.init(jax.random.PRNGKey(0), batch, train=False)
    s_l = create_train_state(cfg_layered, m_l, v_l)
    save_checkpoint(str(tmp_path), s_l, cfg_layered, name="layered")

    m_p = CapsuleRoutingModel(cfg=cfg_pp)
    v_p = m_p.init(jax.random.PRNGKey(1), batch, train=False)
    s_p = create_train_state(cfg_pp, m_p, v_p)
    s_p2 = restore_checkpoint(str(tmp_path), s_p, name="layered", params_only=True)

    out_l = m_l.apply(
        {"params": s_l.params, **({"batch_stats": s_l.batch_stats} if s_l.batch_stats else {})},
        batch, train=False,
    )
    out_p = m_p.apply(
        {"params": s_p2.params, **({"batch_stats": s_p2.batch_stats} if s_p2.batch_stats else {})},
        batch, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_p.logits), np.asarray(out_l.logits), atol=5e-5, rtol=1e-4
    )

    # and back: the pp checkpoint restores into a layered template
    save_checkpoint(str(tmp_path), s_p2, cfg_pp, name="staged")
    s_l2 = restore_checkpoint(str(tmp_path), s_l, name="staged", params_only=True)
    out_l2 = m_l.apply(
        {"params": s_l2.params, **({"batch_stats": s_l2.batch_stats} if s_l2.batch_stats else {})},
        batch, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_l2.logits), np.asarray(out_l.logits), atol=5e-5, rtol=1e-4
    )


def test_hf_import_reaches_pp_layout():
    """import_hf_bert_params -> to_pp_layout: stacked leaves equal per-layer
    imports (the pretrained.load_bert_weights pipeline-layout path)."""
    pytest.importorskip("torch")
    from tests.test_hf_import import L as _L, _fake_hf_state_dict
    from multimodalrouting_tpu.models.clinbert import import_hf_bert_params

    layered = import_hf_bert_params(_fake_hf_state_dict(), layers=_L)
    staged = pp.to_pp_layout(layered)
    assert staged["pp_layers"]["q_kernel"].shape[0] == _L
    np.testing.assert_array_equal(
        np.asarray(staged["pp_layers"]["i_kernel"][1]),
        np.asarray(layered["layer_1"]["intermediate"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(staged["word_embeddings"]["embedding"]),
        np.asarray(layered["word_embeddings"]["embedding"]),
    )


def test_validate_pp_rejects_bad_configs():
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import train_model

    def run(cfg):
        train_model(
            cfg, CapsuleRoutingModel(cfg=cfg), tiny_batch(n=4), tiny_batch(n=4),
            family="capsule", log_fn=lambda s: None,
        )

    with pytest.raises(ValueError, match="divisible"):
        run(_pp_cfg(**{"encoder.bert_layers": 3}))
    with pytest.raises(ValueError, match="pick one"):
        run(_pp_cfg(**{"train.tensor_parallel": True}))
    with pytest.raises(ValueError, match=">= 2"):
        run(_pp_cfg(**{
            "train.num_model_shards": 1, "train.num_data_shards": 2,
        }))
    # the pipelined stack is dropout-free — a layered run with dropout>0
    # would silently diverge in train mode, so it must be rejected loudly
    with pytest.raises(ValueError, match="dropout-free"):
        run(_pp_cfg(**{"encoder.dropout": 0.1}))
    assert get_active_mesh() is None  # validation failures must not leak a mesh


def test_remat_scan_matches_plain(mesh24):
    """model.remat under PP: jax.checkpoint must not change values (fwd+grad)."""
    rng = np.random.default_rng(6)
    w = _rand_stacked(rng)
    x, mask = _inputs(rng, n=8)
    r = jnp.asarray(rng.normal(size=(HID,)), jnp.float32)

    def loss(w, remat):
        out = pp.pipeline_apply(
            w, x, mask, mesh=mesh24, n_micro=2, heads=HEADS,
            dtype=jnp.float32, remat=remat,
        )
        return jnp.sum(jnp.tanh(out @ r) ** 2)

    f_plain, g_plain = jax.jit(jax.value_and_grad(lambda w: loss(w, False)))(w)
    f_remat, g_remat = jax.jit(jax.value_and_grad(lambda w: loss(w, True)))(w)
    assert float(f_plain) == pytest.approx(float(f_remat), rel=1e-6)
    for k in w:
        np.testing.assert_allclose(
            np.asarray(g_remat[k]), np.asarray(g_plain[k]), atol=1e-5, rtol=1e-4
        )


def test_cross_layout_full_resume_raises(tmp_path):
    """--resume across layered/pp layouts must fail loudly (optimizer trees
    mirror the param layout); --init-from (params_only) is the supported path."""
    from multimodalrouting_tpu.ckpt import restore_checkpoint, save_checkpoint
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.state import create_train_state

    cfg_layered = _pp_cfg(**{
        "train.pipeline_parallel": False,
        "train.num_data_shards": 1, "train.num_model_shards": 1,
    })
    cfg_pp = _pp_cfg(**{"train.num_data_shards": 1, "train.num_model_shards": 1})
    batch = tiny_batch(n=4, seed=0)
    m_l = CapsuleRoutingModel(cfg=cfg_layered)
    s_l = create_train_state(
        cfg_layered, m_l, m_l.init(jax.random.PRNGKey(0), batch, train=False)
    )
    save_checkpoint(str(tmp_path), s_l, cfg_layered, name="layered")

    m_p = CapsuleRoutingModel(cfg=cfg_pp)
    s_p = create_train_state(
        cfg_pp, m_p, m_p.init(jax.random.PRNGKey(1), batch, train=False)
    )
    with pytest.raises(ValueError, match="init-from"):
        restore_checkpoint(str(tmp_path), s_p, name="layered", params_only=False)
