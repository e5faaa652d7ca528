"""Top-level models assembling encoders -> routes -> routing -> heads.

Three families, mirroring the reference's three routing mechanisms:
  * CapsuleRoutingModel — flagship 10-route MULT + capsule routing
    (reference: MIMIC-IV/MortModel/Paired_Cross_Attention/main.py:1708-1751 +
    routing_and_heads.py:271-409), also covering the 7-route linear-fusion
    capsule mains (MortModel/main.py, PhenoModel/main.py).
  * GatedConcatModel — 7-route gated concat head
    (reference: MIMIC-IV/Model/routing_and_heads.py:252-353 + train_step3).
  * FAMEPlusPlus — per-route heads + sMRO MMRouting gate
    (reference: train_fame.py:34-73).

Encoder outputs are sanitized like the reference (norm clamp 20 + nan_to_num,
main.py:1772-1796).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.configs import Config
from multimodalrouting_tpu.data.batches import Batch
from multimodalrouting_tpu.models.behrt import BEHRTLabEncoder
from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder
from multimodalrouting_tpu.models.cxr import ImageEncoder
from multimodalrouting_tpu.models.fusions import SevenRouteFusion
from multimodalrouting_tpu.models.mult import MULTRouter
from multimodalrouting_tpu.routes import get_routes, route_mask_from_presence
from multimodalrouting_tpu.routing.capsule_head import (
    CapsuleHead,
    RoutePrimaryProjector,
    compose_priors,
)
from multimodalrouting_tpu.routing.gates import (
    FinalConcatHead,
    RouteGateNet,
    StackedRouteHeads,
    concat_routes,
    loss_based_gates,
    uniform_gates,
)
from multimodalrouting_tpu.routing.smro import MMRouting, loss_based_fuse


class EncodedModalities(NamedTuple):
    l_seq: jnp.ndarray  # [B,T,d]
    l_mask: jnp.ndarray  # [B,T]
    l_pool: jnp.ndarray  # [B,d]
    n_seq: jnp.ndarray  # [B,S,d]
    n_mask: jnp.ndarray  # [B,S]
    n_pool: jnp.ndarray  # [B,d]
    i_seq: jnp.ndarray  # [B,P,d]
    i_mask: jnp.ndarray  # [B,P]
    i_pool: jnp.ndarray  # [B,d]
    chexpert_logits: jnp.ndarray  # [B,14]


class ModelOutput(NamedTuple):
    logits: jnp.ndarray  # [B,K] task logits
    alpha: Optional[jnp.ndarray] = None  # [B,R] route activations
    r_matrix: Optional[jnp.ndarray] = None  # [B,R,K] p(route|label)
    gates: Optional[jnp.ndarray] = None  # [B,R] gate weights
    block_w: Optional[jnp.ndarray] = None  # [B,3] sMRO block weights
    route_logits: Optional[jnp.ndarray] = None  # [B,R,K] per-route logits
    route_embs: Optional[Dict[str, jnp.ndarray]] = None
    pooled: Optional[Dict[str, jnp.ndarray]] = None  # unimodal pooled embs
    chexpert_logits: Optional[jnp.ndarray] = None


def _sanitize(x: jnp.ndarray, max_norm: float = 20.0) -> jnp.ndarray:
    """NaN/Inf guard + row-norm clamp (reference main.py:1772-1796).

    The norm is computed via sqrt(max(sum(x^2), eps)) so the backward pass is
    exactly zero on all-zero rows (padded note chunks are exact zeros; a bare
    jnp.linalg.norm has a 0/0 NaN vjp there that would poison every upstream
    gradient).
    """
    x = jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-12))
    scale = jnp.where(norm > max_norm, max_norm / norm, 1.0)
    return x * scale.astype(x.dtype)


class TriEncoder(nn.Module):
    """The three modality encoders, one forward each, sanitized outputs."""

    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> EncodedModalities:
        e = self.cfg.encoder
        det = not train

        l_seq, l_mask, l_pool = BEHRTLabEncoder(
            n_feats=e.structured_n_feats,
            d=e.d,
            seq_len=e.structured_seq_len,
            n_layers=e.structured_layers,
            n_heads=e.structured_heads,
            pool=e.structured_pool,
            dropout=e.dropout,
            dtype=self.dtype,
            name="behrt",
        )(batch.x_struct, batch.m_struct, deterministic=det)

        n_seq, n_mask, n_pool = BioClinBERTEncoder(
            d=e.d,
            note_agg=e.note_agg,
            chunk_agg=e.note_chunk_agg,
            finetune_text=e.finetune_text,
            int8=e.int8_text,
            pipeline=self.cfg.train.pipeline_parallel,
            pp_microbatches=self.cfg.train.pp_microbatches,
            remat=self.cfg.model.remat,
            vocab_size=e.bert_vocab_size,
            hidden=e.bert_hidden,
            layers=e.bert_layers,
            heads=e.bert_heads,
            intermediate=e.bert_intermediate,
            max_position=e.bert_max_position,
            dropout=e.dropout,
            gelu=e.bert_gelu,
            ln=e.bert_ln,
            dtype=self.dtype,
            name="bbert",
        )(batch.notes_dict(), deterministic=det)

        from multimodalrouting_tpu.models.cxr import normalize_pixels

        i_seq, i_mask, i_pool, chexpert = ImageEncoder(
            d=e.d,
            vision_backbone=e.vision_backbone,
            vision_num_classes=e.vision_num_classes,
            norm_kind=e.vision_norm,
            dtype=self.dtype,
            name="imgenc",
        )(normalize_pixels(batch.image, batch.has_i), train=train)

        # zero sequences/pools of absent modalities so downstream masked ops
        # and route masks see exactly-zero contributions
        def gate_mod(seq, mask, pool, has):
            h = has.astype(seq.dtype)
            return seq * h[:, None, None], mask * has.astype(mask.dtype)[:, None], pool * h[:, None]

        n_seq, n_mask, n_pool = gate_mod(n_seq, n_mask, n_pool, batch.has_n)
        i_seq, i_mask, i_pool = gate_mod(i_seq, i_mask, i_pool, batch.has_i)

        return EncodedModalities(
            l_seq=_sanitize(l_seq),
            l_mask=l_mask,
            l_pool=_sanitize(l_pool),
            n_seq=_sanitize(n_seq),
            n_mask=n_mask,
            n_pool=_sanitize(n_pool),
            i_seq=_sanitize(i_seq),
            i_mask=i_mask,
            i_pool=_sanitize(i_pool),
            chexpert_logits=chexpert,
        )


class CapsuleRoutingModel(nn.Module):
    """Flagship: routes (MULT 10-route or fusion 7-route) -> capsule head."""

    cfg: Config

    @nn.compact
    def __call__(
        self,
        batch: Batch,
        train: bool = False,
        route_mask: Optional[jnp.ndarray] = None,
        acts_override: Optional[jnp.ndarray] = None,
        detach_priors: Optional[bool] = None,
        uniform_routing: Optional[bool] = None,
        act_temperature: Optional[jnp.ndarray] = None,  # traced override
    ) -> ModelOutput:
        m = self.cfg.model
        dtype = jnp.dtype(m.dtype)
        routes = get_routes(m.routes)
        det = not train

        enc = TriEncoder(cfg=self.cfg, dtype=dtype, name="encoders")(batch, train=train)

        if route_mask is None:
            route_mask = route_mask_from_presence(batch.has_l, batch.has_n, batch.has_i, routes)

        if m.routes == "10" and m.bi_fusion_mode == "mult":
            # per-route MulT family (reference PhenoModel/
            # routing_and_heads_atten.py:199-262): every directional route
            # gets its own full MulT stack, pooled at the last valid step
            from multimodalrouting_tpu.models.route_mult import PerRouteMulTFusion

            route_embs = PerRouteMulTFusion(
                d=m.d,
                n_heads=m.mult_heads,
                layers=m.cross_attn_layers,
                attn_dropout=m.attn_dropout,
                relu_dropout=m.relu_dropout,
                res_dropout=m.res_dropout,
                embed_dropout=m.embed_dropout,
                attn_mask=m.cross_attn_mask,
                positions=m.mult_positions,
                dtype=dtype,
                name="route_mult",
            )(
                enc.l_seq, enc.l_mask, enc.l_pool,
                enc.n_seq, enc.n_mask, enc.n_pool,
                enc.i_seq, enc.i_mask, enc.i_pool,
                deterministic=det,
            )
        elif m.routes == "10":
            route_embs = MULTRouter(
                d=m.d,
                num_heads=m.mult_heads,
                layers=m.mult_layers,
                self_layers=m.mult_self_layers,
                attn_dropout=m.attn_dropout,
                relu_dropout=m.relu_dropout,
                res_dropout=m.res_dropout,
                embed_dropout=m.embed_dropout,
                attn_mask=m.attn_mask,
                pool=m.mult_pool,
                positions=m.mult_positions,
                dtype=dtype,
                name="mult",
            )(
                enc.l_seq, enc.n_seq, enc.i_seq,
                enc.l_mask, enc.n_mask, enc.i_mask,
                deterministic=det,
            )
        else:
            route_embs = SevenRouteFusion(
                d=m.d,
                feature_mode=m.fusion_feature_mode,
                bi_fusion_mode=m.bi_fusion_mode,
                tri_fusion_mode=m.tri_fusion_mode,
                p_drop=m.fusion_dropout,
                dtype=dtype,
                name="fusion",
            )(enc.l_pool, enc.n_pool, enc.i_pool, deterministic=det)

        projector = RoutePrimaryProjector(
            routes=routes,
            d_in=m.d,
            pc_dim=m.pc_dim,
            use_route_logit_bias=m.route_logit_bias_init != 0.0,
            interaction_bias_init=m.interaction_bias_init,
            prior_floor=m.projector_prior_floor,
            dtype=dtype,
            name="projector",
        )
        poses, acts = projector(route_embs)

        priors = compose_priors(
            acts,
            route_mask=route_mask,
            acts_override=acts_override,
            act_temperature=m.act_temperature if act_temperature is None else act_temperature,
            prior_floor=m.route_prior_floor,
            prior_ceiling=m.route_prior_ceiling,
            detach=m.detach_priors if detach_priors is None else detach_priors,
        )

        head = CapsuleHead(
            num_routes=len(routes),
            pc_dim=m.pc_dim,
            mc_caps_dim=m.mc_caps_dim,
            num_classes=m.num_classes,
            num_routing=m.num_routing,
            head_style=m.head_style,
            routing_mode="sigmoid_routes" if m.capsule_act_type == "sigmoid_gate" else "softmax_out",
            act_type="ONES" if m.capsule_act_type != "EM" else "EM",
            uniform_routing=m.uniform_routing,
            gate_temp=m.gate_temp,
            gate_min=m.gate_min,
            gate_max=m.gate_max,
            dropout_rate=m.capsule_dropout,
            dtype=dtype,
            name="capsule_head",
        )
        out = head(
            poses,
            priors,
            route_mask=route_mask,
            uniform_routing=uniform_routing,
            deterministic=det,
        )

        return ModelOutput(
            logits=out.logits.astype(jnp.float32),
            alpha=out.alpha.astype(jnp.float32),
            r_matrix=out.r_matrix.astype(jnp.float32),
            route_embs=route_embs,
            pooled={"L": enc.l_pool, "N": enc.n_pool, "I": enc.i_pool},
            chexpert_logits=enc.chexpert_logits.astype(jnp.float32),
        )


class GatedConcatModel(nn.Module):
    """Model/ path: 7 routes -> per-route heads + gates -> FinalConcatHead."""

    cfg: Config

    @nn.compact
    def __call__(
        self,
        batch: Batch,
        train: bool = False,
        gate_mode: Optional[str] = None,
        route_losses: Optional[jnp.ndarray] = None,  # [B,R] for loss_based
        stage: str = "",  # "" | step1 | step2 | step3
    ) -> ModelOutput:
        m = self.cfg.model
        dtype = jnp.dtype(m.dtype)
        routes = get_routes("7")
        det = not train
        n_tasks = m.num_classes

        enc = TriEncoder(cfg=self.cfg, dtype=dtype, name="encoders")(batch, train=train)
        zl, zn, zi = enc.l_pool, enc.n_pool, enc.i_pool

        route_embs = SevenRouteFusion(
            d=m.d,
            feature_mode=m.fusion_feature_mode,
            bi_fusion_mode=m.bi_fusion_mode,
            tri_fusion_mode=m.tri_fusion_mode,
            p_drop=m.fusion_dropout,
            dtype=dtype,
            name="fusion",
        )(zl, zn, zi, deterministic=det)

        z_stack = jnp.stack([route_embs[r] for r in routes], axis=1)
        route_logits = StackedRouteHeads(
            num_routes=len(routes),
            n_tasks=n_tasks,
            p_drop=m.fusion_dropout,
            dtype=dtype,
            name="route_heads",
        )(z_stack, deterministic=det)

        avail = route_mask_from_presence(batch.has_l, batch.has_n, batch.has_i, routes)
        mode = gate_mode or m.gate_mode
        if mode == "uniform":
            gates = uniform_gates(avail)
        elif mode == "loss_based":
            if route_losses is None:
                # per-sample per-route BCE from this forward's route logits —
                # the reference computes this every train step
                # (train_step3_trimodal_router.py:377-394, reduction="none");
                # gradients flow through the gates as in the reference
                from multimodalrouting_tpu.train.losses import bce_with_logits

                y2 = batch.y if batch.y.ndim == 2 else batch.y[:, None]
                per = bce_with_logits(
                    route_logits,
                    jnp.broadcast_to(y2[:, None, :], route_logits.shape),
                    reduce=False,
                )
                route_losses = jnp.mean(per, axis=-1)  # [B,R]
            gates = loss_based_gates(route_losses, avail, alpha=m.gate_alpha)
        else:
            gates = RouteGateNet(
                num_routes=len(routes),
                hidden=m.gate_hidden,
                p_drop=m.fusion_dropout,
                dtype=dtype,
                name="gate_net",
            )(zl, zn, zi, avail=avail, deterministic=det)

        x_cat, _ = concat_routes(route_embs, gates, routes, l2norm=m.l2norm_each)
        logits = FinalConcatHead(
            num_routes=len(routes),
            d=m.d,
            n_tasks=n_tasks,
            p_drop=m.fusion_dropout,
            dtype=dtype,
            name="final_head",
        )(x_cat, deterministic=det)

        # staged semantics (reference train_step1/2): before step3 the final
        # head doesn't exist yet — step1 trains/evaluates the UNIMODAL route
        # heads, step2 the BIMODAL ones. Surface the stage's mean route logit
        # as the model output so the loop's monitor (val AUROC) and loss see
        # the trained heads, not the frozen random final head.
        if stage == "step1":
            logits = jnp.mean(route_logits[:, :3, :], axis=1)
        elif stage == "step2":
            logits = jnp.mean(route_logits[:, 3:6, :], axis=1)

        return ModelOutput(
            logits=logits.astype(jnp.float32),
            gates=gates.astype(jnp.float32),
            route_logits=route_logits.astype(jnp.float32),
            route_embs=route_embs,
            pooled={"L": zl, "N": zn, "I": zi},
            chexpert_logits=enc.chexpert_logits.astype(jnp.float32),
        )


class FAMEPlusPlus(nn.Module):
    """Per-route MLP heads over concatenated unimodal embeddings + MMRouting.

    Reference: train_fame.py:34-73 — route r's head input is the concat of
    its member modalities' pooled embeddings (in_dim = d * len(route)).
    """

    cfg: Config

    @nn.compact
    def __call__(
        self,
        batch: Batch,
        train: bool = False,
        stage: Optional[str] = None,
        route_losses_ema: Optional[jnp.ndarray] = None,  # [R] for loss_based
    ) -> ModelOutput:
        m = self.cfg.model
        dtype = jnp.dtype(m.dtype)
        routes = get_routes("7")
        det = not train
        n_tasks = m.num_classes

        enc = TriEncoder(cfg=self.cfg, dtype=dtype, name="encoders")(batch, train=train)
        pooled = {"L": enc.l_pool, "N": enc.n_pool, "I": enc.i_pool}

        # route head inputs: concat of member modality embeddings, zero-padded
        # to the widest (3d) so all heads run as one stacked program
        feats = []
        for r in routes:
            parts = [pooled[mod] for mod in r]
            x = jnp.concatenate(parts, axis=-1)
            pad = 3 * m.d - x.shape[-1]
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad)))
            feats.append(x)
        z_stack = jnp.stack(feats, axis=1)  # [B,7,3d]

        route_logits = StackedRouteHeads(
            num_routes=len(routes),
            n_tasks=n_tasks,
            p_drop=m.smro_dropout,
            dtype=dtype,
            name="route_heads",
        )(z_stack, deterministic=det)

        if m.smro_gate_mode == "loss_based":
            # deterministic EMA-loss gating (INSPECT/routing.py:10-98,
            # train_fame.py:102,137-140); no stage masks — the uni/bi/tri
            # curriculum freezes the non-stage route heads instead
            if route_losses_ema is None:
                route_losses_ema = jnp.zeros((len(routes),), jnp.float32)
            out = loss_based_fuse(route_logits, route_losses_ema, m.smro_alpha, routes)
        else:
            out = MMRouting(
                routes=routes,
                gate_hidden=m.smro_gate_hidden,
                p_drop=m.smro_dropout,
                strict_freeze_gate=m.strict_freeze_gate,
                dtype=dtype,
                name="mm_routing",
            )(route_logits, pooled["L"], pooled["N"], pooled["I"], stage=stage, deterministic=det)

        return ModelOutput(
            logits=out.fused.astype(jnp.float32),
            gates=out.route_w.astype(jnp.float32),
            block_w=out.block_w.astype(jnp.float32),
            route_logits=route_logits.astype(jnp.float32),
            pooled=pooled,
            chexpert_logits=enc.chexpert_logits.astype(jnp.float32),
        )


def build_model(cfg: Config, family: str = "capsule") -> nn.Module:
    if family == "capsule":
        return CapsuleRoutingModel(cfg=cfg)
    if family == "gated_concat":
        return GatedConcatModel(cfg=cfg)
    if family == "fame":
        return FAMEPlusPlus(cfg=cfg)
    raise ValueError(f"Unknown model family {family!r}")
