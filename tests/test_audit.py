"""Audit subsystem tests: occlusion, UC/BI/TI, drop tables, exports, ckpt."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalrouting_tpu.audit.attribution import (
    compute_uc_bi_ti,
    route_contributions_occlusion,
)
from multimodalrouting_tpu.audit.droptable import drop_table_eval, format_drop_table
from multimodalrouting_tpu.audit.exports import routing_heatmap_tables
from multimodalrouting_tpu.routes import ROUTES_10


def test_occlusion_identifies_informative_route():
    rng = np.random.default_rng(0)
    b, r, d = 8, 7, 4
    embs = jnp.asarray(rng.normal(size=(b, r, d)).astype(np.float32))
    gates = jnp.ones((b, r)) / r
    # head reads ONLY route 2's block
    w = np.zeros((r * d,), np.float32)
    w[2 * d : 3 * d] = 1.0

    def head(x_cat):
        return x_cat @ jnp.asarray(w)

    contrib = np.asarray(route_contributions_occlusion(head, embs, gates))
    assert contrib.shape == (b, r)
    np.testing.assert_allclose(contrib[:, [0, 1, 3, 4, 5, 6]], 0.0, atol=1e-6)
    assert np.any(np.abs(contrib[:, 2]) > 1e-4)


def test_uc_bi_ti_additive_and_pure_interactions():
    rng = np.random.default_rng(1)
    b = 64
    l = jnp.asarray(rng.normal(size=(b, 1)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(b, 1)).astype(np.float32))
    i = jnp.asarray(rng.normal(size=(b, 1)).astype(np.float32))

    # pure additive f: BI and TI must vanish
    f_add = lambda a, c, d: (a + 2 * c - d)[:, 0]  # noqa: E731
    uc, bi, ti = compute_uc_bi_ti(f_add, l, n, i, rng=jax.random.PRNGKey(0), n_mc=30)
    assert float(jnp.abs(bi).mean()) < 0.15
    assert float(jnp.abs(ti).mean()) < 0.15
    assert float(jnp.abs(uc).mean()) > 0.5

    # pure pairwise product: UC small, BI dominant
    f_pair = lambda a, c, d: (a * c)[:, 0]  # noqa: E731
    uc2, bi2, ti2 = compute_uc_bi_ti(f_pair, l, n, i, rng=jax.random.PRNGKey(1), n_mc=30)
    assert float(jnp.abs(bi2).mean()) > float(jnp.abs(ti2).mean())


def test_drop_table(tmp_path):
    from tests.helpers import tiny_batch

    batch = tiny_batch(n=32)
    rng = np.random.default_rng(2)

    def predict(b):
        # fake model whose quality degrades when modalities are missing
        signal = np.asarray(b.y) * 0.6 + rng.random(b.batch_size) * 0.2
        avail = (np.asarray(b.has_l) + np.asarray(b.has_n) + np.asarray(b.has_i)) / 3.0
        return np.clip(signal * avail + (1 - avail) * 0.5, 0, 1)

    table = drop_table_eval(predict, batch, seed=0)
    assert set(table) == {"full", "dropL", "dropN", "dropI", "rand1"}
    assert "delta_auroc" in table["dropN"]
    txt = format_drop_table(table)
    assert "dropI" in txt


def test_routing_heatmap_exports(tmp_path):
    rng = np.random.default_rng(3)
    alpha = rng.uniform(0.1, 0.9, size=(50, 10))
    r = rng.uniform(0, 1, size=(50, 10, 2))
    r = r / r.sum(axis=1, keepdims=True)
    out = routing_heatmap_tables(alpha, r, ROUTES_10, str(tmp_path), split="val")
    assert len(out["mean_alpha"]) == 10
    assert os.path.exists(tmp_path / "val_R_route_given_label_raw.npy")
    assert os.path.exists(tmp_path / "val_route_audit.json")
    col_sums = np.asarray(out["mean_R_route_given_label"]).sum(axis=0)
    np.testing.assert_allclose(col_sums, 1.0, rtol=1e-6)


def test_reliability_diagram_export(tmp_path):
    from multimodalrouting_tpu.audit.exports import save_reliability_diagram

    rng = np.random.default_rng(0)
    probs = rng.uniform(0, 1, size=400)
    y = (rng.uniform(0, 1, size=400) < probs).astype(np.float64)  # calibrated
    paths = save_reliability_diagram(y, probs, str(tmp_path), split="test")
    assert os.path.exists(paths["csv"])
    with open(paths["csv"]) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "bin_lo,bin_hi,confidence,accuracy,count"
    assert len(lines) == 11  # header + 10 bins
    # counts cover the full sample
    total = sum(int(ln.split(",")[-1]) for ln in lines[1:])
    assert total == 400
    # on calibrated data every populated bin's |acc - conf| is small
    for ln in lines[1:]:
        _, _, conf, acc, count = ln.split(",")
        if int(count) >= 20:
            assert abs(float(acc) - float(conf)) < 0.2


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from multimodalrouting_tpu.ckpt import load_meta, restore_checkpoint, save_checkpoint
    from multimodalrouting_tpu.models.full import build_model
    from multimodalrouting_tpu.train.state import create_train_state
    from tests.helpers import tiny_batch, tiny_config

    cfg = tiny_config(**{"model.routes": "10", "model.num_classes": 2})
    batch = tiny_batch()
    model = build_model(cfg, "capsule")
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = create_train_state(cfg, model, variables)
    save_checkpoint(str(tmp_path), state, cfg, name="best", thresholds=np.array([0.4]))

    # perturb then restore
    zeroed = state.replace(
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params)
    )
    restored = restore_checkpoint(str(tmp_path), zeroed, name="best")
    orig = jax.tree_util.tree_leaves(state.params)
    back = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    meta = load_meta(str(tmp_path), "best")
    assert meta["thresholds"] == [0.4]
    assert meta["config"]["model"]["routes"] == "10"


def test_probes():
    from multimodalrouting_tpu.audit.probes import (
        mask_stats,
        pretty_print_small_batch,
        quantization_check,
        route_cosine_report,
    )
    from tests.helpers import tiny_batch

    rng = np.random.default_rng(9)
    embs = {r: rng.normal(size=(8, 16)) for r in ("L", "N", "I")}
    rep = route_cosine_report(embs)
    assert not rep["collapse_suspect"]
    embs_collapsed = {"A": embs["L"], "B": embs["L"] * 1.001}
    assert route_cosine_report(embs_collapsed)["collapse_suspect"]

    ms = mask_stats(chunk=np.array([[1, 0], [0, 0]], np.float32))
    assert ms["chunk"]["frac_empty"] == 0.5

    qc = quantization_check(np.zeros((4, 4)), "zeros")
    assert qc["suspicious"] and qc["frac_zero"] == 1.0

    text = pretty_print_small_batch(tiny_batch(n=2))
    assert "x_struct" in text and "shape=" in text
