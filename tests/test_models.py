"""Smoke + invariant tests for the three model families."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalrouting_tpu.models.full import build_model
from tests.helpers import tiny_batch, tiny_config

pytestmark = pytest.mark.slow  # compile-heavy: full model forwards


def init_and_run(model, batch, **kwargs):
    params = model.init(jax.random.PRNGKey(0), batch, train=False, **kwargs)
    out = model.apply(params, batch, train=False, **kwargs)
    return params, out


@pytest.mark.parametrize("routes,num_classes", [("10", 2), ("7", 25)])
def test_capsule_model_forward(routes, num_classes):
    cfg = tiny_config(**{"model.routes": routes, "model.num_classes": num_classes})
    batch = tiny_batch()
    model = build_model(cfg, "capsule")
    _, out = init_and_run(model, batch)
    r = 10 if routes == "10" else 7
    assert out.logits.shape == (4, num_classes)
    assert out.alpha.shape == (4, r)
    assert out.r_matrix.shape == (4, r, num_classes)
    # R sums to 1 over routes per label (route-audit invariant,
    # reference main.py:319-338 assert_routing_over_routes)
    np.testing.assert_allclose(np.asarray(out.r_matrix).sum(axis=1), 1.0, rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(out.logits)))


def test_capsule_model_respects_route_mask():
    cfg = tiny_config(**{"model.routes": "10", "model.num_classes": 2})
    batch = tiny_batch(missing_rate=0.9, seed=3)  # most samples missing N/I
    model = build_model(cfg, "capsule")
    _, out = init_and_run(model, batch)
    from multimodalrouting_tpu.routes import ROUTES_10, route_mask_from_presence

    rm = np.asarray(
        route_mask_from_presence(batch.has_l, batch.has_n, batch.has_i, ROUTES_10)
    )
    alpha = np.asarray(out.alpha)
    assert np.all(alpha[rm == 0] == 0.0), "masked routes must have zero activation"
    r = np.asarray(out.r_matrix)
    assert np.all(r[rm == 0] == 0.0), "masked routes must get zero routing mass"


def test_gated_concat_model_modes():
    cfg = tiny_config(**{"model.num_classes": 1})
    batch = tiny_batch()
    model = build_model(cfg, "gated_concat")
    params, out = init_and_run(model, batch)
    assert out.logits.shape == (4, 1)
    assert out.gates.shape == (4, 7)
    np.testing.assert_allclose(np.asarray(out.gates).sum(1), 1.0, rtol=1e-4)
    assert out.route_logits.shape == (4, 7, 1)

    out_u = model.apply(params, batch, train=False, gate_mode="uniform")
    np.testing.assert_allclose(np.asarray(out_u.gates).sum(1), 1.0, rtol=1e-4)

    rl = jnp.abs(out.route_logits[..., 0])
    out_lb = model.apply(params, batch, train=False, gate_mode="loss_based", route_losses=rl)
    np.testing.assert_allclose(np.asarray(out_lb.gates).sum(1), 1.0, rtol=1e-4)


def test_fame_model_stages():
    cfg = tiny_config(**{"model.num_classes": 3})
    batch = tiny_batch(task="multitask")
    model = build_model(cfg, "fame")
    params, out = init_and_run(model, batch)
    assert out.logits.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(out.gates).sum(1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.block_w).sum(1), 1.0, rtol=1e-4)

    out_uni = model.apply(params, batch, train=False, stage="uni")
    g = np.asarray(out_uni.gates)
    assert np.all(g[:, 3:] < 1e-6), "uni stage must zero interaction route gates"
    bw = np.asarray(out_uni.block_w)
    assert np.all(bw[:, 1:] < 1e-6)


def test_capsule_model_grad_flows():
    cfg = tiny_config(**{"model.routes": "10", "model.num_classes": 2})
    batch = tiny_batch()
    model = build_model(cfg, "capsule")
    params = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(p):
        out = model.apply(p, batch, train=False)
        return jnp.mean((out.logits[:, 1] - out.logits[:, 0] - batch.y) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total > 0
    # frozen BERT: no gradient into bert encoder params
    bert_g = g["params"]["encoders"]["bbert"]["bert"]
    assert all(float(jnp.abs(x).sum()) == 0 for x in jax.tree_util.tree_leaves(bert_g))


def test_grad_finite_with_bert_projection_and_padded_chunks():
    """Regression: padded (all-zero) note chunks + d != bert_hidden used to
    produce NaN grads through the sanitize norm backward."""
    cfg = tiny_config(
        **{
            "model.routes": "10",
            "model.num_classes": 2,
            "encoder.bert_hidden": 48,  # != d -> projection path exists
        }
    )
    batch = tiny_batch(n=4)
    assert float(np.asarray(batch.chunk_mask).min()) == 0.0, "need padded chunks"
    model = build_model(cfg, "capsule")
    params = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(p):
        out = model.apply(p, batch, train=False)
        return jnp.mean((out.logits[:, 1] - out.logits[:, 0] - batch.y) ** 2)

    g = jax.grad(loss_fn)(params)
    for path, leaf in jax.tree_util.tree_flatten_with_path(g)[0]:
        assert bool(jnp.all(jnp.isfinite(leaf))), f"non-finite grad at {path}"


def test_mult_last_pooling_variant():
    cfg = tiny_config(
        **{"model.routes": "10", "model.num_classes": 2, "model.mult_pool": "last"}
    )
    batch = tiny_batch()
    model = build_model(cfg, "capsule")
    _, out = init_and_run(model, batch)
    assert out.logits.shape == (4, 2)
    assert np.all(np.isfinite(np.asarray(out.logits)))


def test_per_route_mult_family_trains():
    """bi_fusion_mode=mult with routes=10 selects the per-route MulT builder
    (models/route_mult.py) and trains end-to-end with finite decreasing loss."""
    from tests.test_train import _fit

    losses, state, model, cfg, batch = _fit(
        "capsule",
        {
            "model.routes": "10",
            "model.bi_fusion_mode": "mult",
            "model.cross_attn_layers": 1,
        },
    )
    assert losses[-1] < losses[0]
    # param tree actually contains the per-route builder, not MULTRouter
    flat = state.params
    assert "route_mult" in flat and "mult" not in flat


@pytest.mark.slow
def test_densenet121_backbone_shapes_and_param_count():
    """DenseNet-121 backbone (MedFuse's published CXR default; the reference
    instantiates any torchvision backbone by name, encoders.py:385-424).
    Param-count oracle: torchvision densenet121 feature extractor has exactly
    6,953,856 weights (total 7,978,856 minus the 1024->1000 classifier)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalrouting_tpu.models.cxr import ImageEncoder

    enc = ImageEncoder(d=32, vision_backbone="densenet121", norm_kind="batch")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    tokens, token_mask, pooled, chexpert = enc.apply(variables, x)

    assert pooled.shape == (2, 32)
    assert chexpert.shape == (2, 14)
    # 64 -> /2 conv0 -> /2 pool -> /2 /2 /2 transitions = 2x2 final grid, 1024ch
    assert tokens.shape == (2, 4, 32)
    assert token_mask.shape == (2, 4)
    assert np.isfinite(np.asarray(pooled)).all()

    backbone = variables["params"]["backbone"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(backbone))
    assert n_params == 6_953_856, n_params

    # train-mode forward keeps a batch_stats collection (BN running stats)
    out, mut = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut
