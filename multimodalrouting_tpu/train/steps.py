"""Jitted train/eval steps for all model families.

One fused program per step: encoders -> routes -> routing -> loss -> grads ->
masked/guarded optimizer update -> EMA, with optional microbatch gradient
accumulation. Loss semantics per family follow the reference drivers
(SURVEY.md §2.2): death-logit BCE + smoothing for the mortality capsule
(main.py:3092-3126), clamped-pos-weight multi-label BCE for phenotyping
(PhenoModel PCA :2449-2459), final BCE + 0.05 aux-LNI for the gated-concat
path (train_step3:407-415), multitask BCE + fairness for FAME
(train_fame.py:114-140). Route dropout randomly masks one interaction route
per sample during training (main.py:3027-3033).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodalrouting_tpu.configs import Config
from multimodalrouting_tpu.data.batches import Batch
from multimodalrouting_tpu.routes import (
    ROUTE_REQUIRES,
    get_blocks,
    get_routes,
    route_mask_from_presence,
)
from multimodalrouting_tpu.train.losses import (
    bce_with_logits,
    clamped_pos_weight,
    death_logit,
    eddi_loss,
    focal_bce_with_logits,
    routing_regularizers,
)
from multimodalrouting_tpu.train.state import TrainState, apply_gradients


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    task_loss: jnp.ndarray
    reg_loss: jnp.ndarray
    grad_finite: jnp.ndarray
    alpha_mean: Optional[jnp.ndarray] = None  # [R] batch-mean route activations
    gates_mean: Optional[jnp.ndarray] = None


def apply_route_dropout(
    route_mask: jnp.ndarray, routes: Tuple[str, ...], rng: jax.Array, p: float
) -> jnp.ndarray:
    """With prob p per sample, zero one randomly-chosen interaction route."""
    if p <= 0.0:
        return route_mask
    b, r = route_mask.shape
    inter_idx = jnp.asarray(
        [i for i, name in enumerate(routes) if len(ROUTE_REQUIRES[name]) > 1]
    )
    k_rng, d_rng = jax.random.split(rng)
    choice = inter_idx[jax.random.randint(k_rng, (b,), 0, len(inter_idx))]
    do_drop = jax.random.uniform(d_rng, (b,)) < p
    drop_onehot = jax.nn.one_hot(choice, r, dtype=route_mask.dtype) * do_drop[:, None].astype(
        route_mask.dtype
    )
    return route_mask * (1.0 - drop_onehot)


def _fairness_reg(cfg: Config, out, batch: Batch, y2: jnp.ndarray) -> jnp.ndarray:
    """gamma-weighted differentiable fairness penalty on the first task head
    (reference: Model/train_step3 gamma·EDDI mix; train_fame.py soft-EO)."""
    t = cfg.train
    if t.fairness_gamma <= 0.0 or batch.sens is None:
        return jnp.asarray(0.0, jnp.float32)
    probs = jax.nn.sigmoid(out.logits[:, 0].astype(jnp.float32))
    if t.fairness_kind == "eq_odds":
        from multimodalrouting_tpu.train.losses import soft_eq_odds_loss

        pen = soft_eq_odds_loss(probs, y2[:, 0], batch.sens)
    else:
        pen = eddi_loss(probs, y2[:, 0], batch.sens)
    return t.fairness_gamma * pen


def _task_loss(
    cfg: Config, family: str, out, batch: Batch, route_mask, stage: str = ""
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    t, m = cfg.train, cfg.model
    y = batch.y
    if family == "capsule":
        if m.task == "mort":
            logit = death_logit(out.logits) if m.num_classes == 2 else out.logits[:, 0]
            if t.use_focal:
                task = focal_bce_with_logits(logit, y, gamma=t.focal_gamma, alpha=t.focal_alpha)
            else:
                # imbalance modes sampler|pos_weight|hybrid (reference
                # MortModel/Baseline/main:864-870): pos_weight/hybrid apply a
                # clamped neg/pos reweight in the loss as well
                pw = None
                if t.sampler_mode in ("pos_weight", "hybrid"):
                    pw = clamped_pos_weight(y[:, None], *t.pos_weight_clip)[0]
                task = bce_with_logits(
                    logit, y, pos_weight=pw, label_smoothing=t.label_smoothing
                )
        else:  # pheno multi-label
            pw = clamped_pos_weight(y, *t.pos_weight_clip)
            task = bce_with_logits(out.logits, y, pos_weight=pw, label_smoothing=t.label_smoothing)
        reg = routing_regularizers(
            out.r_matrix,
            route_mask,
            entropy_bonus=t.routing_entropy_bonus,
            uniform_penalty=t.routing_uniform_penalty,
        )
        return task, reg
    if family == "gated_concat":
        y2 = y if y.ndim == 2 else y[:, None]
        if stage in ("step1", "step2"):
            # staged pretraining loss: mean of the stage's per-route BCEs
            # (reference train_step1:305-309 (loss_L+loss_N+loss_I)/3,
            # train_step2:317 analogous over LN/LI/NI); no final-head or aux
            # terms exist yet at these stages
            sel = slice(0, 3) if stage == "step1" else slice(3, 6)
            per = bce_with_logits(
                out.route_logits[:, sel, :],
                jnp.broadcast_to(y2[:, None, :], out.route_logits[:, sel, :].shape),
                label_smoothing=t.label_smoothing,
            )
            return per, _fairness_reg(cfg, out, batch, y2)
        task = bce_with_logits(out.logits, y2, label_smoothing=t.label_smoothing)
        # aux LNI route loss (train_step3:407-415, default weight 0.05)
        if t.aux_lni_weight > 0.0:
            lni = out.route_logits[:, -1, :]
            task = task + t.aux_lni_weight * bce_with_logits(lni, y2)
        # optional all-route supervision — an extension with no reference
        # counterpart (step3 trains only final head + aux LNI); off by default
        if t.per_route_aux_weight > 0.0:
            per_route = bce_with_logits(
                out.route_logits, jnp.broadcast_to(y2[:, None, :], out.route_logits.shape)
            )
            task = task + t.per_route_aux_weight * per_route
        reg = _fairness_reg(cfg, out, batch, y2)
        return task, reg
    if family == "fame":
        y2 = y if y.ndim == 2 else y[:, None]
        task = bce_with_logits(out.logits, y2, label_smoothing=t.label_smoothing)
        reg = _fairness_reg(cfg, out, batch, y2)
        return task, reg
    raise ValueError(f"Unknown family {family!r}")


def make_train_step(cfg: Config, model, family: str = "capsule", **apply_kwargs):
    """Build a jitted train step closed over static config/model."""
    routes = get_routes(cfg.model.routes if family == "capsule" else "7")
    t = cfg.train
    n_micro = max(int(t.microbatch), 0)
    stage = apply_kwargs.get("stage", "")

    # loss-based sMRO curriculum: the stage freezes the NON-stage route heads
    # (reference INSPECT/train_fame.py:122-126 toggles heads.<route>
    # requires_grad per phase); everything else — encoders, projections —
    # trains in every phase. head_keep is a static [R] 0/1 vector.
    head_keep = None
    track_route_ema = family == "fame" and cfg.model.smro_gate_mode == "loss_based"
    if track_route_ema and stage in ("uni", "bi", "tri"):
        keep_idx = set(get_blocks(routes)[stage])
        head_keep = jnp.asarray(
            [1.0 if i in keep_idx else 0.0 for i in range(len(routes))], jnp.float32
        )

    def forward_loss(params, batch_stats, batch: Batch, rng, detach_priors, act_temp, route_ema):
        rm = route_mask_from_presence(batch.has_l, batch.has_n, batch.has_i, routes)
        drop_rng, dropout_rng = jax.random.split(rng)
        rm = apply_route_dropout(rm, routes, drop_rng, t.route_dropout_p)

        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]

        kwargs = dict(apply_kwargs)
        if family == "capsule":
            kwargs["route_mask"] = rm
            kwargs["detach_priors"] = detach_priors
            if act_temp is not None:
                kwargs["act_temperature"] = act_temp
        if track_route_ema:
            kwargs["route_losses_ema"] = route_ema
        result = model.apply(
            variables,
            batch,
            train=True,
            rngs={"dropout": dropout_rng},
            mutable=mutable or False,
            **kwargs,
        )
        if mutable:
            out, mutated = result
            new_bs = mutated.get("batch_stats", batch_stats)
        else:
            out, new_bs = result, batch_stats

        task, reg = _task_loss(cfg, family, out, batch, rm, stage=stage)
        # CheXpert 14-class auxiliary BCE (MedFuse parity,
        # MortModel/encoders.py:374-481); only image-present samples count
        if t.chexpert_weight > 0.0 and batch.chexpert is not None:
            cx = bce_with_logits(
                out.chexpert_logits,
                batch.chexpert,
                sample_weight=batch.has_i.astype(jnp.float32),
                reduce=False,
            )
            denom = jnp.clip(jnp.sum(batch.has_i.astype(jnp.float32)), 1.0, None)
            reg = reg + t.chexpert_weight * jnp.sum(cx) / (denom * cx.shape[-1])
        loss = task + reg
        # per-route losses for the route-loss EMA (INSPECT/train_fame.py:107-111
        # — plain per-route BCE vs the labels, no smoothing); lax.stop_gradient
        # keeps them observation-only, matching the reference where only the
        # fused loss is backpropagated
        per_route = None
        if track_route_ema:
            y2 = batch.y if batch.y.ndim == 2 else batch.y[:, None]
            rl = jax.lax.stop_gradient(out.route_logits)
            per = bce_with_logits(
                rl, jnp.broadcast_to(y2[:, None, :], rl.shape), reduce=False
            )
            per_route = jnp.mean(per, axis=(0, 2))  # [R]
        return loss, (task, reg, out, new_bs, per_route)

    @functools.partial(
        jax.jit, static_argnames=("detach_priors", "note_pack"), donate_argnums=(0,)
    )
    def train_step(
        state: TrainState,
        batch: Batch,
        rng: jax.Array,
        lr_head: jnp.ndarray,
        lr_enc: jnp.ndarray,
        detach_priors: bool = False,
        act_temperature: Optional[jnp.ndarray] = None,
        note_pack: int = 0,
    ) -> Tuple[TrainState, StepMetrics]:
        # trace-time: chunk-pack the frozen-BERT forward to `note_pack` chunks
        from multimodalrouting_tpu.models.clinbert import note_pack_capacity

        grad_fn = jax.value_and_grad(forward_loss, has_aux=True)

        # capacity is computed for the FULL batch; under microbatching the
        # per-microbatch valid count is unknown at trace time, so packing is
        # disabled rather than risking dropped chunks
        with note_pack_capacity(0 if n_micro > 1 else note_pack):
            if n_micro > 1:
                b = batch.batch_size
                mb = b // n_micro
                rngs = jax.random.split(rng, n_micro)

                def one(i):
                    sub = Batch(*(None if v is None else v[i * mb : (i + 1) * mb] for v in batch))
                    (loss, (task, reg, out, bs, pr)), grads = grad_fn(
                        state.params, state.batch_stats, sub, rngs[i], detach_priors,
                        act_temperature, state.route_loss_ema,
                    )
                    return loss, task, reg, out, bs, pr, grads

                loss, task, reg, out, new_bs, per_route, grads = one(0)
                for i in range(1, n_micro):
                    li, ti, ri, out, new_bs, pi, gi = one(i)
                    loss, task, reg = loss + li, task + ti, reg + ri
                    if per_route is not None:
                        per_route = per_route + pi
                    grads = jax.tree_util.tree_map(jnp.add, grads, gi)
                scale = 1.0 / n_micro
                loss, task, reg = loss * scale, task * scale, reg * scale
                if per_route is not None:
                    per_route = per_route * scale
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            else:
                (loss, (task, reg, out, new_bs, per_route)), grads = grad_fn(
                    state.params, state.batch_stats, batch, rng, detach_priors,
                    act_temperature, state.route_loss_ema,
                )

        mask_fn = None
        if head_keep is not None:
            # loss-based sMRO curriculum: freeze the non-stage route heads by
            # masking their slices along the stacked route axis — on the grads
            # (keeps Adam moments at zero) AND on the post-optimizer updates
            # (blocks decoupled weight decay from moving frozen slices).
            # Reference INSPECT/train_fame.py:122-126 toggles requires_grad on
            # heads.<route>.*; note its substring matching — `any(rt in name)`
            # — is a defect we intentionally do not port: stages here use the
            # exact route sets uni={L,N,I}, bi={LN,LI,NI}, tri={LNI}.
            def _mask_heads(tree):
                def mask(path, g):
                    if any(str(getattr(p, "key", "")) == "route_heads" for p in path):
                        return g * head_keep.reshape((-1,) + (1,) * (g.ndim - 1)).astype(g.dtype)
                    return g

                return jax.tree_util.tree_map_with_path(mask, tree)

            grads = _mask_heads(grads)
            mask_fn = _mask_heads

        new_state, finite = apply_gradients(
            state,
            grads,
            lr_head=lr_head,
            lr_enc=lr_enc,
            ema_decay=t.ema_decay,
            new_batch_stats=new_bs,
            update_mask_fn=mask_fn,
        )
        if per_route is not None and state.route_loss_ema is not None:
            # EMA of per-route losses feeding the deterministic gate next step
            # (INSPECT/train_fame.py:137-140: ema = ema*beta + losses*(1-beta));
            # frozen on non-finite batches alongside the rest of the update
            beta = t.route_loss_ema_beta
            ok = jnp.logical_and(finite, jnp.all(jnp.isfinite(per_route)))
            new_rle = jnp.where(
                ok,
                state.route_loss_ema * beta + per_route * (1.0 - beta),
                state.route_loss_ema,
            )
            new_state = new_state.replace(route_loss_ema=new_rle)
        metrics = StepMetrics(
            loss=loss,
            task_loss=task,
            reg_loss=reg,
            grad_finite=finite,
            alpha_mean=None if out.alpha is None else jnp.mean(out.alpha, axis=0),
            gates_mean=None if out.gates is None else jnp.mean(out.gates, axis=0),
        )
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config, model, family: str = "capsule", use_ema: bool = True, **apply_kwargs):
    routes = get_routes(cfg.model.routes if family == "capsule" else "7")
    track_route_ema = family == "fame" and cfg.model.smro_gate_mode == "loss_based"

    @functools.partial(jax.jit, static_argnames=("note_pack",))
    def eval_step(state: TrainState, batch: Batch, note_pack: int = 0):
        from multimodalrouting_tpu.models.clinbert import note_pack_capacity

        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        rm = route_mask_from_presence(batch.has_l, batch.has_n, batch.has_i, routes)
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        kwargs = dict(apply_kwargs)
        if family == "capsule":
            kwargs["route_mask"] = rm
        if track_route_ema:
            # loss-based gate evaluates with the trained route-loss EMA
            # (INSPECT/train_fame.py:155-158 router(self.model(batch), self.ema))
            kwargs["route_losses_ema"] = state.route_loss_ema
        with note_pack_capacity(note_pack):
            out = model.apply(variables, batch, train=False, **kwargs)
        return out

    return eval_step
