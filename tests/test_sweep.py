"""Interpretability sweep on a trained-at-init gated model."""
import jax
import numpy as np

from multimodalrouting_tpu.audit.sweep import (
    gated_model_sweep,
    print_inference_demo,
    sweep_to_rows,
)
from multimodalrouting_tpu.models.full import build_model
from tests.helpers import tiny_batch, tiny_config
import pytest

pytestmark = pytest.mark.slow  # end-to-end sweep/demo runs


def test_gated_sweep_and_demo(capsys):
    cfg = tiny_config(**{"model.num_classes": 1})
    batch = tiny_batch(n=8)
    model = build_model(cfg, "gated_concat")
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)

    pooled = {k: np.asarray(v) for k, v in out.pooled.items()}
    sweep = gated_model_sweep(
        cfg, variables["params"], pooled, n_mc=4, rng=jax.random.PRNGKey(1)
    )
    assert sweep["gates"].shape == (8, 7)
    assert sweep["route_contrib"].shape[:2] == (8, 7)
    # sanity: occluding with the same head reproduces logits coherently
    assert np.all(np.isfinite(sweep["route_contrib"]))
    # decomposition pieces finite
    for k in ("uc", "bi", "ti"):
        assert np.all(np.isfinite(sweep[k]))

    rows = sweep_to_rows(sweep)
    assert len(rows) == 8
    assert "gate__LNI" in rows[0] and "route_contrib__L" in rows[0]

    text = print_inference_demo(sweep, k=2)
    assert "block means" in text
    # consistency: sweep head logits match the full model's logits
    np.testing.assert_allclose(
        sweep["logits"].ravel(), np.asarray(out.logits).ravel(), rtol=1e-4, atol=1e-5
    )
