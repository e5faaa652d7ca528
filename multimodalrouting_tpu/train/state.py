"""Train state: params + batch_stats + optimizer + EMA, with staged freezing.

Replaces the reference's ad-hoc per-module optimizers and EMA class
(reference: MIMIC-IV/MortModel/Paired_Cross_Attention/main.py:58-108 EMA,
:2780-2913 optimizer groups with encoder/head LRs, :2954-2965 encoder warmup;
Model/train_step{1,2,3} freezing) with one pytree:
  * one AdamW partition for trainable params + a structural zero partition
    for frozen ones (optax.multi_transform) — frozen subtrees (e.g. the
    110M-param frozen BERT) carry NO Adam moments at all, matching the
    reference's requires_grad=False exclusion and saving ~0.9 GB HBM,
  * encoder-vs-head learning rates as traced scalars (no recompiles when the
    host-side plateau schedule moves them),
  * EMA shadow params updated on-device each step, with frozen leaves
    statically skipped (they never move),
  * a finite-grad guard that skips the whole update on non-finite grads.
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
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    stage: str = flax.struct.field(pytree_node=False, default="")
    finetune_text: bool = flax.struct.field(pytree_node=False, default=False)
    # EMA of per-route losses for the loss-based sMRO gate
    # (INSPECT/train_fame.py:102 `self.ema = torch.zeros(R)`); None for
    # families that don't track it
    route_loss_ema: Any = None


def _path_keys(path):
    return [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]


def _leaf_is_encoder(path) -> bool:
    return any(k in ENCODER_TOP_KEYS for k in _path_keys(path))


def _leaf_is_frozen_bert(path, finetune_text: bool) -> bool:
    """The BERT backbone is excluded from optimization when finetune_text is
    off (reference main.py:2801-2807 keeps bbert requires_grad=False)."""
    keys = _path_keys(path)
    return (not finetune_text) and "bbert" in keys and "bert" in keys


def leaf_trainable(path, stage: str, finetune_text: bool) -> bool:
    """Static per-leaf trainability: curriculum stage freezing + frozen BERT.

    * step1 (unimodal): train encoders + unimodal machinery; freeze fusions,
      gates, final head (reference train_step1 trains enc + L/N/I heads).
    * step2 (bimodal): freeze encoders; train fusions + route heads
      (train_step2_bimodal.py:261-265).
    * step3 (trimodal): freeze all but final head, LNI fusion, gate net
      (train_step3_trimodal_router.py:282-312).
    * ""/full and sMRO uni/bi/tri: everything trainable (sMRO stages freeze
      via stop-gradients inside MMRouting, routing/smro.py).
    """
    if _leaf_is_frozen_bert(path, finetune_text):
        return False
    keys = _path_keys(path)

    def has(*names):
        return any(k in names for k in keys)

    if stage in ("", None, "full", "uni", "bi", "tri"):
        return True
    if stage == "step1":
        return not has("fusion", "mult", "gate_net", "final_head")
    if stage == "step2":
        if has("encoders"):
            return False
        return has("fusion", "mult", "route_heads")
    if stage == "step3":
        return has("final_head", "gate_net") or (has("fusion") and has("LNI"))
    raise ValueError(f"Unknown stage {stage!r}")


def encoder_flag_tree(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.asarray(1.0 if _leaf_is_encoder(path) else 0.0), params
    )


def trainable_mask_for_stage(params, stage: str, finetune_text: bool = True) -> Any:
    """Trainability as a 0/1 jnp tree (test/introspection helper)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.asarray(1.0 if leaf_trainable(path, stage, finetune_text) else 0.0),
        params,
    )


def make_optimizer(
    cfg: Config, params: Any, stage: str = "", finetune_text: bool = False
) -> optax.GradientTransformation:
    """AdamW over the trainable partition; structural zero for frozen leaves
    (no Adam state allocated for them)."""
    t = cfg.train
    train_tx = optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.scale_by_adam(),
        optax.add_decayed_weights(t.weight_decay),
        optax.scale(-1.0),  # LR applied per-parameter in apply_gradients
    )
    labels = jax.tree_util.tree_map_with_path(
        lambda path, x: "train" if leaf_trainable(path, stage, finetune_text) else "frozen",
        params,
    )
    return optax.multi_transform(
        {"train": train_tx, "frozen": optax.set_to_zero()}, labels
    )


def n_route_loss_ema_for(cfg: Config, family: str) -> int:
    """Routes tracked by the loss-based sMRO gate's EMA buffer, or 0.

    Only the fame family with model.smro_gate_mode="loss_based" carries the
    buffer (reference INSPECT/train_fame.py:102 `torch.zeros(len(ROUTES))`).
    """
    if family == "fame" and cfg.model.smro_gate_mode == "loss_based":
        return 7
    return 0


def create_train_state(
    cfg: Config,
    model,
    variables: Dict[str, Any],
    stage: str = "",
    n_route_loss_ema: int = 0,
) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    finetune_text = cfg.encoder.finetune_text
    if (
        cfg.encoder.frozen_text_bf16
        and not finetune_text
        and not cfg.encoder.int8_text
        and jnp.dtype(cfg.model.dtype) == jnp.bfloat16
    ):
        # frozen-BERT bf16 at rest: output-identical (bf16 compute casts the
        # fp32 masters to bf16 at every use anyway), halves the frozen body's
        # HBM residency. Frozen leaves carry no Adam state and are statically
        # skipped by the EMA, so nothing else needs to change.
        params = jax.tree_util.tree_map_with_path(
            lambda path, x: (
                x.astype(jnp.bfloat16)
                if _leaf_is_frozen_bert(path, finetune_text) and x.dtype == jnp.float32
                else x
            ),
            params,
        )
    tx = make_optimizer(cfg, params, stage=stage, finetune_text=finetune_text)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        # distinct buffers so donation of the state never aliases params
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if cfg.train.use_ema else None,
        apply_fn=model.apply,
        tx=tx,
        stage=stage or "",
        finetune_text=finetune_text,
        route_loss_ema=(
            jnp.zeros((n_route_loss_ema,), jnp.float32) if n_route_loss_ema > 0 else None
        ),
    )


def apply_gradients(
    state: TrainState,
    grads: Any,
    *,
    lr_head: jnp.ndarray,
    lr_enc: jnp.ndarray,
    ema_decay: float,
    new_batch_stats: Optional[Any] = None,
    update_mask_fn: Optional[Callable[[Any], Any]] = None,
) -> Tuple[TrainState, jnp.ndarray]:
    """Apply one optimizer step with a finite-grad guard.

    Non-finite gradients skip the whole update (params, opt state, EMA) —
    parity with the reference's grads_are_finite step-skip (main.py:51-57,
    :3148-3159). Returns (new_state, all_finite flag).

    update_mask_fn, when given, is applied to the post-optimizer update tree
    — needed for sub-leaf (sliced) freezing, where zeroing the gradient alone
    still lets AdamW's decoupled weight decay move the frozen slices.
    """
    stage, finetune = state.stage, state.finetune_text

    finite = jnp.asarray(True)
    for leaf in jax.tree_util.tree_leaves(grads):
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(leaf)))

    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    if update_mask_fn is not None:
        updates = update_mask_fn(updates)

    # per-parameter learning rates (encoder warmup / groups); static paths
    updates = jax.tree_util.tree_map_with_path(
        lambda path, u: u * (lr_enc if _leaf_is_encoder(path) else lr_head),
        updates,
    )
    new_params = optax.apply_updates(state.params, updates)

    pick = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
        lambda a, b: jnp.where(finite, a, b), new, old
    )
    new_params = pick(new_params, state.params)
    new_opt_state = pick(new_opt_state, state.opt_state)

    if state.ema_params is not None:
        # statically skip frozen leaves — they never move, so EMA == param
        new_ema = jax.tree_util.tree_map_with_path(
            lambda path, e, p: (
                jnp.where(finite, e * ema_decay + (1.0 - ema_decay) * p, e)
                if leaf_trainable(path, stage, finetune)
                else e
            ),
            state.ema_params,
            new_params,
        )
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
