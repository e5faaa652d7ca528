"""Train state: params + batch_stats + optimizer + EMA, with staged freezing.

Replaces the reference's ad-hoc per-module optimizers and EMA class
(reference: MIMIC-IV/MortModel/Paired_Cross_Attention/main.py:58-108 EMA,
:2780-2913 optimizer groups with encoder/head LRs, :2954-2965 encoder warmup;
Model/train_step{1,2,3} freezing) with one pytree:
  * one AdamW chain with per-parameter LR multipliers (encoder vs head),
  * trainable masks for curriculum stages (freeze = zero update, exactly the
    reference's requires_grad=False),
  * EMA shadow params updated on-device each step,
  * learning-rate scale passed as a traced scalar so host-side plateau
    scheduling never triggers recompilation.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from multimodalrouting_tpu.configs import Config

ENCODER_TOP_KEYS = ("encoders",)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    # per-parameter multiplier trees (0/1 freeze mask x encoder flag)
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    enc_flags: Any = None  # 1.0 where param belongs to an encoder
    trainable: Any = None  # 1.0 where param is trainable in this stage


def _path_has(path, names) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    return any(k in names for k in keys)


def encoder_flag_tree(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.asarray(1.0 if _path_has(path, ENCODER_TOP_KEYS) else 0.0),
        params,
    )


def trainable_mask_for_stage(params, stage: str) -> Any:
    """Curriculum freeze masks.

    * step1 (unimodal): train encoders + unimodal machinery; freeze fusions,
      gates, final head (reference train_step1 trains enc + L/N/I heads).
    * step2 (bimodal): freeze encoders; train fusions + route heads
      (train_step2_bimodal.py:261-265).
    * step3 (trimodal): freeze all but final head, LNI fusion, gate net
      (train_step3_trimodal_router.py:282-312).
    * "" / full: everything trainable.
    """

    def flag(path, _x):
        keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]

        def has(*names):
            return any(k in names for k in keys)

        if stage in ("", None, "full", "uni", "bi", "tri"):
            # sMRO stages freeze via stop-gradients inside MMRouting
            # (routing/smro.py), not via parameter masks — lower-block heads
            # get exactly-zero gradients because their gates are masked out
            return jnp.asarray(1.0)
        if stage == "step1":
            return jnp.asarray(0.0 if has("fusion", "mult", "gate_net", "final_head") else 1.0)
        if stage == "step2":
            if has("encoders"):
                return jnp.asarray(0.0)
            return jnp.asarray(1.0 if has("fusion", "mult", "route_heads") else 0.0)
        if stage == "step3":
            keep = has("final_head", "gate_net") or (has("fusion") and has("LNI"))
            return jnp.asarray(1.0 if keep else 0.0)
        raise ValueError(f"Unknown stage {stage!r}")

    return jax.tree_util.tree_map_with_path(flag, params)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.scale_by_adam(),
        optax.add_decayed_weights(t.weight_decay),
        optax.scale(-1.0),  # LR applied per-parameter in the train step
    )


def create_train_state(
    cfg: Config,
    model,
    variables: Dict[str, Any],
    stage: str = "",
) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        # distinct buffers so donation of the state never aliases params
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if cfg.train.use_ema else None,
        apply_fn=model.apply,
        tx=tx,
        enc_flags=encoder_flag_tree(params),
        trainable=trainable_mask_for_stage(params, stage),
    )


def apply_gradients(
    state: TrainState,
    grads: Any,
    *,
    lr_head: jnp.ndarray,
    lr_enc: jnp.ndarray,
    ema_decay: float,
    new_batch_stats: Optional[Any] = None,
) -> Tuple[TrainState, jnp.ndarray]:
    """Apply one optimizer step with a finite-grad guard.

    Non-finite gradients skip the whole update (params, opt state, EMA) —
    parity with the reference's grads_are_finite step-skip (main.py:51-57,
    :3148-3159). Returns (new_state, all_finite flag).
    """
    finite = jnp.asarray(True)
    for leaf in jax.tree_util.tree_leaves(grads):
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(leaf)))

    # freeze-masked grads
    grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, state.trainable)

    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    # mask the *updates* too: frozen params must not move at all (the
    # reference's requires_grad=False excludes them from weight decay as well)
    updates = jax.tree_util.tree_map(
        lambda u, m, is_enc: u * m * jnp.where(is_enc > 0, lr_enc, lr_head),
        updates,
        state.trainable,
        state.enc_flags,
    )
    new_params = optax.apply_updates(state.params, updates)

    pick = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
        lambda a, b: jnp.where(finite, a, b), new, old
    )
    new_params = pick(new_params, state.params)
    new_opt_state = pick(new_opt_state, state.opt_state)

    if state.ema_params is not None:
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * ema_decay + (1.0 - ema_decay) * p,
            state.ema_params,
            new_params,
        )
        new_ema = pick(new_ema, state.ema_params)
    else:
        new_ema = None

    bs = state.batch_stats
    if new_batch_stats is not None:
        bs = jax.tree_util.tree_map(
            lambda a, b: jnp.where(finite, a, b), new_batch_stats, state.batch_stats
        )

    return (
        state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            batch_stats=bs,
        ),
        finite,
    )
