"""Pallas capsule kernel vs the XLA reference (interpret mode on CPU).

The production attention fast path is the tuned upstream flash-attention
kernel (ops/flash.py); the hand-rolled Pallas attention core it replaced was
deleted in round 2 (it only reached parity with fused XLA — see PERF.md).
"""
import jax
import jax.numpy as jnp
import numpy as np

from multimodalrouting_tpu.ops.capsule import capsule_routing, capsule_weight_init
from multimodalrouting_tpu.ops.pallas_capsule import capsule_routing_pallas
import pytest

pytestmark = pytest.mark.slow  # pallas interpret-mode kernels


def test_pallas_capsule_matches_xla():
    rng = np.random.default_rng(0)
    b, n, a, m, d = 8, 10, 32, 25, 64
    pose = jnp.asarray(rng.normal(size=(b, n, a)).astype(np.float32))
    act = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, n)).astype(np.float32))
    w = capsule_weight_init(jax.random.PRNGKey(0), n, a, m, d)

    ref = capsule_routing(pose, act, w, 3)
    got_pose, got_act, got_coef = capsule_routing_pallas(pose, act, w, 3, True)
    np.testing.assert_allclose(np.asarray(got_pose), np.asarray(ref.pose), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_act), np.asarray(ref.act), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_coef), np.asarray(ref.coef), rtol=1e-5, atol=1e-6)


def test_pallas_capsule_grad_matches_xla():
    rng = np.random.default_rng(1)
    b, n, a, m, d = 4, 7, 16, 2, 32
    pose = jnp.asarray(rng.normal(size=(b, n, a)).astype(np.float32))
    act = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, n)).astype(np.float32))
    w = capsule_weight_init(jax.random.PRNGKey(1), n, a, m, d)

    def loss_pallas(w_):
        p, _, c = capsule_routing_pallas(pose, act, w_, 3, True)
        return jnp.sum(p**2) + jnp.sum(c * c)

    def loss_xla(w_):
        out = capsule_routing(pose, act, w_, 3)
        return jnp.sum(out.pose**2) + jnp.sum(out.coef * out.coef)

    g_pallas = jax.grad(loss_pallas)(w)
    g_xla = jax.grad(loss_xla)(w)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-5)


def test_splash_self_attention_matches_xla(monkeypatch):
    """ops/flash.py splash variant == masked XLA softmax attention on valid
    query rows (pad-query rows are garbage by contract, masked downstream)."""
    monkeypatch.setenv("MMR_SPLASH_INTERPRET", "1")
    from multimodalrouting_tpu.ops.flash import splash_self_attention

    rng = np.random.default_rng(2)
    b, t, h, dh = 2, 256, 2, 64
    q = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32)) * dh**-0.5
    k = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    valid = np.ones((b, t), np.float32)
    valid[0, 200:] = 0.0  # ragged pad tail
    kv_mask = jnp.asarray(valid)

    got = np.asarray(splash_self_attention(q, k, v, kv_mask))

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    logits = jnp.where(kv_mask.astype(bool)[:, None, None, :], logits, -1e30)
    ref = np.asarray(
        jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, axis=-1), v)
    )
    m = valid.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], rtol=2e-4, atol=2e-5)


def _packed_oracle(q, k, v, valid, h):
    """Masked per-head softmax attention over the packed [B,T,H*dh] layout."""
    b, t, d = q.shape
    dh = d // h
    q4 = q.reshape(b, t, h, dh)
    k4 = k.reshape(b, t, h, dh)
    v4 = v.reshape(b, t, h, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q4, k4)
    logits = jnp.where(jnp.asarray(valid).astype(bool)[:, None, None, :], logits, -1e30)
    out = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, axis=-1), v4)
    return np.asarray(out.reshape(b, t, d))


@pytest.mark.parametrize("h,dh", [(4, 64), (2, 128)])
def test_packed_flash_matches_xla(h, dh):
    """ops/flash_packed.py == masked XLA attention on valid-query rows, for
    both the head-pair (dh=64, lane-masked) and single-head (dh=128) paths;
    an all-pad row must come out finite (uniform), not NaN."""
    from multimodalrouting_tpu.ops.flash_packed import packed_flash_self_attention

    rng = np.random.default_rng(3)
    b, t = 3, 256
    d = h * dh
    q = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32)) * dh**-0.5
    k = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    valid = np.ones((b, t), np.float32)
    valid[0, 200:] = 0.0  # ragged pad tail
    valid[1, :] = 0.0  # all-pad chunk: garbage-but-finite by contract

    got = np.asarray(
        packed_flash_self_attention(q, k, v, jnp.asarray(valid), h, interpret=True)
    )
    assert np.isfinite(got).all()
    ref = _packed_oracle(q, k, v, valid, h)
    m = valid.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], rtol=2e-4, atol=2e-5)


def test_packed_flash_none_mask_and_blocks(monkeypatch):
    """kv_mask=None == all-valid; MMR_PACKED_BLOCK_Q override is honored and
    value-preserving."""
    from multimodalrouting_tpu.ops.flash_packed import packed_flash_self_attention

    rng = np.random.default_rng(4)
    b, t, h, dh = 2, 256, 4, 64
    d = h * dh
    q = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32)) * dh**-0.5
    k = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    base = np.asarray(packed_flash_self_attention(q, k, v, None, h, interpret=True))
    ref = _packed_oracle(q, k, v, np.ones((b, t), np.float32), h)
    np.testing.assert_allclose(base, ref, rtol=2e-4, atol=2e-5)
    monkeypatch.setenv("MMR_PACKED_BLOCK_Q", "128")
    blk = np.asarray(packed_flash_self_attention(q, k, v, None, h, interpret=True))
    np.testing.assert_allclose(blk, base, rtol=1e-6, atol=1e-7)


def test_packed_flash_frozen_clinbert_integration(monkeypatch):
    """The frozen BioClinBERTEncoder takes the packed-attention path
    (MMR_ATTN=packed, interpret on CPU) and matches the XLA path; gradients
    to the trainable projection still flow (the kernel is behind the frozen
    body's stop_gradient, so its missing VJP is never needed)."""
    from multimodalrouting_tpu.models import attention as attn_mod
    from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder
    from multimodalrouting_tpu.ops import flash as flash_mod

    monkeypatch.setenv("MMR_ATTN", "packed")
    monkeypatch.setenv("MMR_PACKED_INTERPRET", "1")
    monkeypatch.setattr(flash_mod, "flash_available", lambda: True)

    b, s, length = 2, 2, 256
    rng = np.random.default_rng(5)
    notes = {
        "input_ids": jnp.asarray(rng.integers(0, 512, size=(b, s, length)), jnp.int32),
        "attention_mask": jnp.asarray(
            (rng.random((b, s, length)) > 0.1).astype(np.int32)
        ),
        "chunk_mask": jnp.ones((b, s), jnp.float32),
    }
    enc = BioClinBERTEncoder(
        d=32, vocab_size=512, hidden=128, layers=1, heads=2,
        intermediate=64, max_position=length, finetune_text=False,
    )
    variables = enc.init(jax.random.PRNGKey(0), notes)
    _, _, pooled_packed = enc.apply(variables, notes)

    monkeypatch.setenv("MMR_ATTN", "xla")
    _, _, pooled_xla = enc.apply(variables, notes)
    np.testing.assert_allclose(
        np.asarray(pooled_packed), np.asarray(pooled_xla), rtol=2e-4, atol=2e-5
    )

    # grad through the trainable projection works despite the no-VJP kernel
    monkeypatch.setenv("MMR_ATTN", "packed")

    def loss(p):
        _, _, pooled = enc.apply({"params": p}, notes)
        return jnp.sum(pooled**2)

    g = jax.grad(loss)(variables["params"])
    gp = g["proj"]["kernel"]
    assert np.isfinite(np.asarray(gp)).all() and np.abs(np.asarray(gp)).max() > 0
    # frozen body: BERT leaves get zero grads
    gb = jax.tree_util.tree_leaves(g["bert"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in gb)


def test_packed_default_dispatch_finetuned(monkeypatch):
    """Under the default impl (MMR_ATTN unset -> "flash"), a FINE-TUNED
    BioClinBERTEncoder now dispatches the packed kernel too (the pallas
    backward covers T<=512), so the fine-tuned-text workload skips the
    head-split re-tiling copies in both directions; outputs and grads must
    match the XLA path, and BERT-body grads must be nonzero (trainable)."""
    from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder
    from multimodalrouting_tpu.ops import flash as flash_mod
    from multimodalrouting_tpu.ops import flash_packed as fp

    monkeypatch.delenv("MMR_ATTN", raising=False)
    monkeypatch.setenv("MMR_PACKED_INTERPRET", "1")
    monkeypatch.setattr(flash_mod, "flash_available", lambda: True)
    calls = []
    real = fp.packed_flash_self_attention

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(fp, "packed_flash_self_attention", spy)

    b, s, length = 2, 2, 256
    rng = np.random.default_rng(6)
    notes = {
        "input_ids": jnp.asarray(rng.integers(0, 512, size=(b, s, length)), jnp.int32),
        "attention_mask": jnp.asarray(
            (rng.random((b, s, length)) > 0.1).astype(np.int32)
        ),
        "chunk_mask": jnp.ones((b, s), jnp.float32),
    }
    enc = BioClinBERTEncoder(
        d=32, vocab_size=512, hidden=128, layers=1, heads=2,
        intermediate=64, max_position=length, finetune_text=True,
    )
    variables = enc.init(jax.random.PRNGKey(0), notes)

    def loss(p):
        _, _, pooled = enc.apply({"params": p}, notes)
        return jnp.sum(pooled**2)

    l_packed, g_packed = jax.value_and_grad(loss)(variables["params"])
    assert calls, "fine-tuned default path did not dispatch the packed kernel"

    monkeypatch.setenv("MMR_ATTN", "xla")
    l_xla, g_xla = jax.value_and_grad(loss)(variables["params"])
    np.testing.assert_allclose(float(l_packed), float(l_xla), rtol=2e-4)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_packed)
    flat_x = jax.tree_util.tree_leaves(g_xla)
    for (path, gp), gx in zip(flat_p, flat_x):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
    # fine-tuned: the BERT body trains, so its grads are nonzero
    gb = jax.tree_util.tree_leaves(g_packed["bert"])
    assert max(float(jnp.abs(x).max()) for x in gb) > 0


@pytest.mark.parametrize("h,dh", [(4, 64), (2, 128)])
def test_packed_flash_backward_kernel(h, dh, monkeypatch):
    """The packed-layout pallas BACKWARD (dq/dk/dv in [B,T,H*dh], one
    128-lane chunk per grid step) equals the VJP of the mathematically
    identical XLA attention for both the head-pair (dh=64) and single-head
    (dh=128) paths, with a ragged key-pad mask."""
    from multimodalrouting_tpu.ops import flash_packed as fp

    rng = np.random.default_rng(7)
    b, t = 2, 256
    d = h * dh
    q = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32)) * dh**-0.5
    k = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    valid = np.ones((b, t), np.float32)
    valid[0, 190:] = 0.0
    mask = jnp.asarray(valid)
    ct = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    # pad-query rows of the output are masked downstream -> their cotangent
    # is zero in every real program; zero it here so the comparison matches
    # how the kernel is actually used
    ct = ct * mask[:, :, None]

    def f_kernel(q, k, v):
        return fp.packed_flash_self_attention(q, k, v, mask, h, interpret=True)

    def f_xla(q, k, v):
        return fp._xla_attention(q, k, v, mask, h)

    monkeypatch.setenv("MMR_PACKED_BWD", "pallas")
    _, vjp_kernel = jax.vjp(f_kernel, q, k, v)
    got = vjp_kernel(ct)
    _, vjp_ref = jax.vjp(f_xla, q, k, v)
    ref = vjp_ref(ct)
    for g, r, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-5, err_msg=name
        )

    # the XLA fallback path (MMR_PACKED_BWD=xla) stays available and agrees
    monkeypatch.setenv("MMR_PACKED_BWD", "xla")
    _, vjp_fb = jax.vjp(f_kernel, q, k, v)
    fb = vjp_fb(ct)
    for g, r in zip(fb, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-6, atol=1e-7)
