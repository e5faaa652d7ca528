"""Mid-curriculum fame evaluation must fuse only the trained blocks.

The reference only runs its full fusion (stage="eval", train_fame.py:267)
AFTER the tri stage; per-epoch monitoring during uni/bi is this framework's
addition and must use the stage's masks — otherwise the untrained blocks
(and the block gate's untrained logits for them) pollute the monitor,
early stopping, and best-checkpoint selection.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalrouting_tpu.models.full import build_model
from tests.helpers import tiny_batch, tiny_config


def _perturb_tri_head(params):
    """Add large noise to the LNI (index 6) slice of the stacked route heads."""

    def mod(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        if "route_heads" in names and hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == 7:
            return leaf.at[6].add(7.0)
        return leaf

    return jax.tree_util.tree_map_with_path(mod, params)


def test_stage_bi_eval_invariant_to_tri_head():
    cfg = tiny_config()
    model = build_model(cfg, "fame")
    batch = tiny_batch(n=4, seed=3)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    out_bi = model.apply(variables, batch, train=False, stage="bi").logits
    perturbed = {**variables, "params": _perturb_tri_head(variables["params"])}
    out_bi_p = model.apply(perturbed, batch, train=False, stage="bi").logits
    np.testing.assert_allclose(
        np.asarray(out_bi), np.asarray(out_bi_p), rtol=1e-6, atol=1e-6,
        err_msg="stage-bi fusion leaked the (masked) tri block",
    )

    # full fusion DOES see the tri head — the perturbation must show
    out_full = model.apply(variables, batch, train=False).logits
    out_full_p = model.apply(perturbed, batch, train=False).logits
    assert not np.allclose(np.asarray(out_full), np.asarray(out_full_p), atol=1e-3)


@pytest.mark.slow
def test_loop_passes_stage_to_fame_eval(monkeypatch, tmp_path):
    import multimodalrouting_tpu.train.loop as L
    from multimodalrouting_tpu.train.loop import train_model

    captured = {}
    orig = L.make_eval_step

    def spy(cfg, model, family, **kw):
        captured.update(kw)
        return orig(cfg, model, family, **kw)

    monkeypatch.setattr(L, "make_eval_step", spy)
    cfg = tiny_config(**{
        "train.epochs": 1, "train.batch_size": 4, "train.use_ema": False,
        "train.min_epochs": 0, "train.sampler_mode": "none",
        "train.stage": "bi",
    })
    model = build_model(cfg, "fame")
    train_model(
        cfg, model, tiny_batch(n=8, seed=0), tiny_batch(n=4, seed=1),
        family="fame", stage="bi", log_fn=lambda s: None,
    )
    assert captured.get("stage") == "bi", (
        "fame mid-stage eval must carry the curriculum stage"
    )
