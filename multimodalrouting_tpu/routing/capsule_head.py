"""Capsule routing heads: route projector, prior composition, decision heads.

Parity targets in the reference:
  * RoutePrimaryProjector — MIMIC-IV/MortModel/Paired_Cross_Attention/
    routing_and_heads.py:101-121 (plain) and MIMIC-IV/MortModel/
    routing_and_heads.py:170-225 (learnable per-route logit bias with
    logit(0.30) anti-collapse init on interaction routes).
  * RouteDimAdapter — .../Paired_Cross_Attention/routing_and_heads.py:124-155.
  * Prior composition (mask multiply, logit-space temperature, floor/ceiling
    clamp, detach warmup) — .../routing_and_heads.py:316-352.
  * CapsuleHead decision paths —
      - "rmatrix": all-ones masked routing acts; logits from the R-matrix
        aggregation d_bkp = einsum('brk,brp->bkp') -> pose_to_mc ->
        class-embedding einsum (.../Paired_Cross_Attention/
        routing_and_heads.py:194-268);
      - "class_linear": real priors drive routing; per-class Linear on the two
        decision poses (MIMIC-IV/MortModel/routing_and_heads.py:261-305);
      - "class_embed": real priors; class-embedding einsum on decision poses
        (MIMIC-IV/PhenoModel/routing_and_heads.py:283).

TPU-first: the per-route Linear ModuleDicts become ONE stacked weight einsum
[R, d_in, pc+1]; routing runs in the fp32 island of ops/capsule.py.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodalrouting_tpu.ops.capsule import (
    capsule_routing,
    capsule_weight_init,
    route_given_label,
)

INTERACTION_ROUTES = ("LN", "NL", "LI", "IL", "NI", "IN", "LNI")


class RoutePrimaryProjector(nn.Module):
    """Per-route Linear(d_in -> pc_dim+1) -> (poses [B,R,pc], acts [B,R,1])."""

    routes: Tuple[str, ...]
    d_in: int
    pc_dim: int
    use_route_logit_bias: bool = False
    interaction_bias_init: float = -0.8472978603872037  # logit(0.30)
    # projector-level floor clamp on activations (7-route MortModel parity:
    # MortModel/routing_and_heads.py:209-212); 0 = disabled (PCA semantics)
    prior_floor: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, route_embs: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        r = len(self.routes)
        missing = set(self.routes) - set(route_embs)
        if missing:
            raise KeyError(f"route_embs missing routes: {sorted(missing)}")
        x = jnp.stack([route_embs[k] for k in self.routes], axis=1)  # [B,R,d_in]

        # stacked per-route Linear: one einsum instead of R tiny matmuls
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (r, self.d_in, self.pc_dim + 1),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (r, self.pc_dim + 1), self.param_dtype)
        pc_all = (
            jnp.einsum("brd,rdp->brp", x.astype(self.dtype), kernel.astype(self.dtype))
            + bias.astype(self.dtype)[None]
        )
        poses = pc_all[:, :, : self.pc_dim]
        raw_logits = pc_all[:, :, self.pc_dim :]  # [B,R,1]

        if self.use_route_logit_bias:
            init = np.zeros((r, 1), dtype=np.float32)
            for i, name in enumerate(self.routes):
                if name in INTERACTION_ROUTES:
                    init[i, 0] = self.interaction_bias_init
            route_logit_bias = self.param(
                "route_logit_bias", lambda key: jnp.asarray(init, self.param_dtype),
            )
            raw_logits = raw_logits + route_logit_bias.astype(self.dtype)[None]

        acts = jax.nn.sigmoid(raw_logits.astype(jnp.float32)).astype(self.dtype)
        if self.prior_floor > 0.0:
            acts = jnp.clip(acts, self.prior_floor, None)
        return poses, acts


class RouteDimAdapter(nn.Module):
    """Per-route Linear(src -> d_in, no bias) as one stacked einsum."""

    routes: Tuple[str, ...]
    d_in: int
    d_src: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, route_embs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.d_src == self.d_in:
            return dict(route_embs)
        x = jnp.stack([route_embs[k] for k in self.routes], axis=1)  # [B,R,src]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (len(self.routes), self.d_src, self.d_in),
            self.param_dtype,
        )
        y = jnp.einsum("brs,rsd->brd", x.astype(self.dtype), kernel.astype(self.dtype))
        return {k: y[:, i] for i, k in enumerate(self.routes)}


def compose_priors(
    acts: jnp.ndarray,
    *,
    route_mask: Optional[jnp.ndarray] = None,
    acts_override: Optional[jnp.ndarray] = None,
    act_temperature: float = 1.0,
    prior_floor: float = 0.02,
    prior_ceiling: float = 0.98,
    detach: bool = False,
) -> jnp.ndarray:
    """Compose capsule priors from projector activations [B,R,1] -> [B,R,1].

    Order of operations mirrors the reference bridge
    (routing_and_heads.py:312-352): override -> mask multiply -> logit-space
    temperature (fp32) -> floor/ceiling clamp -> optional stop_gradient.
    With a route mask, temperature and clamping only touch kept entries
    (masked-out entries stay exactly 0).
    """
    if acts.ndim == 2:
        acts = acts[..., None]
    prior = acts if acts_override is None else acts_override.astype(acts.dtype)
    if prior.ndim == 2:
        prior = prior[..., None]

    keep = None
    if route_mask is not None:
        rm = route_mask
        if rm.ndim == 1:
            rm = jnp.broadcast_to(rm[None], (prior.shape[0], rm.shape[0]))
        keep = rm[..., None].astype(bool)
        prior = prior * rm[..., None].astype(prior.dtype)

    # temperature may be a traced scalar (annealed 2.0 -> 1.0 across epochs
    # without recompiling, reference MortModel/main.py act-temp schedule)
    is_traced_temp = isinstance(act_temperature, jnp.ndarray)
    if is_traced_temp or act_temperature != 1.0:
        x32 = jnp.clip(prior.astype(jnp.float32), 1e-6, 1.0 - 1e-6)
        logits32 = jnp.log(x32) - jnp.log1p(-x32)
        tempered = jax.nn.sigmoid(logits32 / act_temperature).astype(prior.dtype)
        prior = jnp.where(keep, tempered, prior) if keep is not None else tempered

    lo = prior_floor if prior_floor > 0.0 else 0.0
    hi = prior_ceiling if prior_ceiling > 0.0 else 1.0
    clamped = jnp.clip(prior, lo, hi)
    prior = jnp.where(keep, clamped, prior) if keep is not None else clamped

    if detach:
        prior = jax.lax.stop_gradient(prior)
    return prior


class CapsuleHeadOut(NamedTuple):
    logits: jnp.ndarray  # [B,K] (or [B,2] for class_linear)
    alpha: jnp.ndarray  # [B,R] route activations (priors)
    r_matrix: jnp.ndarray  # [B,R,K] p(route | label) — the route-audit output
    coef: jnp.ndarray  # [B,R,K] raw routing coefficients


class CapsuleHead(nn.Module):
    """Routing-by-agreement decision head over route capsules."""

    num_routes: int
    pc_dim: int
    mc_caps_dim: int
    num_classes: int
    num_routing: int = 3
    head_style: str = "rmatrix"  # rmatrix | class_linear | class_embed
    routing_mode: str = "softmax_out"  # softmax_out | sigmoid_routes
    act_type: str = "ONES"
    uniform_routing: bool = False
    # sigmoid-gate clamps (reference capsule_atten.py:107-124), used by the
    # sigmoid_routes mode
    gate_temp: float = 1.0
    gate_min: float = 0.0
    gate_max: float = 1.0
    # train-time decision-pose dropout, applied to the routing output every
    # iteration (reference capsule_layers.py:118 self.drop; wired from
    # CFG.dropout at MortModel/main.py:897 — the runnable default is 0.0)
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        poses: jnp.ndarray,  # [B,R,pc]
        priors: jnp.ndarray,  # [B,R,1] composed priors
        route_mask: Optional[jnp.ndarray] = None,  # [B,R] or [R]
        uniform_routing: Optional[bool] = None,
        deterministic: bool = True,
    ) -> CapsuleHeadOut:
        b, r, _ = poses.shape
        if r != self.num_routes:
            raise ValueError(f"poses has {r} routes, head expects {self.num_routes}")
        if priors.ndim == 2:
            priors = priors[..., None]
        uniform = self.uniform_routing if uniform_routing is None else uniform_routing

        w = self.param(
            "w",
            lambda key: capsule_weight_init(
                key, self.num_routes, self.pc_dim, self.num_classes, self.mc_caps_dim
            ).astype(self.param_dtype),
        )

        rm = None
        if route_mask is not None:
            rm = route_mask
            if rm.ndim == 1:
                rm = jnp.broadcast_to(rm[None], (b, r))
            rm = rm.astype(poses.dtype)
            poses = poses * rm[..., None]
            priors = priors * rm[..., None]

        if self.head_style == "rmatrix":
            # routing sees all-ones (masked) acts; alpha enters only through
            # the final R-weighted aggregation (reference
            # routing_and_heads.py:208-221)
            routing_act = jnp.ones((b, r), dtype=poses.dtype)
            if rm is not None:
                routing_act = routing_act * rm
        else:
            routing_act = priors[..., 0]

        drop_rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            drop_rng = self.make_rng("dropout")

        out = capsule_routing(
            poses,
            routing_act,
            w.astype(self.dtype),
            self.num_routing,
            mode=self.routing_mode,
            act_type=self.act_type,
            uniform_routing=uniform,
            gate_temp=self.gate_temp,
            gate_min=self.gate_min,
            gate_max=self.gate_max,
            dropout_rate=self.dropout_rate,
            dropout_rng=drop_rng,
        )
        alpha = priors[..., 0]

        r_matrix = route_given_label(out.coef, route_mask=rm)

        if self.head_style == "rmatrix":
            # d_bkp = sum_r R[b,r,k] * pose[b,r,p]
            d_bkp = jnp.einsum("brk,brp->bkp", r_matrix.astype(jnp.float32), poses.astype(jnp.float32))
            pose_to_mc = nn.Dense(
                self.mc_caps_dim, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="pose_to_mc"
            )
            d_bkm = pose_to_mc(d_bkp.astype(self.dtype))  # [B,K,mc]
            embedding = self.param(
                "embedding", nn.initializers.zeros, (self.num_classes, self.mc_caps_dim), self.param_dtype
            )
            bias = self.param("bias", nn.initializers.zeros, (self.num_classes,), self.param_dtype)
            logits = (
                jnp.einsum("bkm,km->bk", d_bkm, embedding.astype(self.dtype))
                + bias.astype(self.dtype)[None]
            )
        elif self.head_style == "class_linear":
            # per-class Linear on decision poses (MortModel 2-class)
            cls_kernel = self.param(
                "cls_kernel",
                nn.initializers.normal(stddev=0.02),
                (self.num_classes, self.mc_caps_dim),
                self.param_dtype,
            )
            cls_bias = self.param("cls_bias", nn.initializers.zeros, (self.num_classes,), self.param_dtype)
            logits = (
                jnp.einsum("bkm,km->bk", out.pose.astype(self.dtype), cls_kernel.astype(self.dtype))
                + cls_bias.astype(self.dtype)[None]
            )
        elif self.head_style == "class_embed":
            embedding = self.param(
                "embedding", nn.initializers.zeros, (self.num_classes, self.mc_caps_dim), self.param_dtype
            )
            bias = self.param("bias", nn.initializers.zeros, (self.num_classes,), self.param_dtype)
            logits = (
                jnp.einsum("bmd,md->bm", out.pose.astype(self.dtype), embedding.astype(self.dtype))
                + bias.astype(self.dtype)[None]
            )
        else:
            raise ValueError(f"Unknown head_style {self.head_style!r}")

        return CapsuleHeadOut(logits=logits, alpha=alpha, r_matrix=r_matrix, coef=out.coef)
