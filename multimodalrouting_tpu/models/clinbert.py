"""Bio-ClinicalBERT note encoder as one batched XLA program.

Behavioral parity target: reference MIMIC-IV/MortModel/Paired_Cross_Attention/
encoders.py:255-513 (BioClinBERTEncoder) — pretokenized 512-token chunk stacks
[B,S,L] encoded per chunk (CLS / masked-mean / masked-max token aggregation),
projected LayerNorm+Linear(hidden->d, no bias), returned as a chunk sequence
[B,S,d] + chunk_mask [B,S] with masked-mean pooling.

TPU-first redesign: instead of the reference's Python loop over `chunk_bs`
minibatches (encoders.py:449-472), ALL B*S chunks run as ONE static-shape
batched BERT forward — sharded over the device mesh ('data', 'model') axes by
the caller. The frozen-BERT default (finetune_text=False) becomes a
`jax.lax.stop_gradient` on the chunk embeddings so XLA prunes the backward
pass entirely.

The module is a faithful BERT-base (post-LN) so HF `emilyalsentzer/
Bio_ClinicalBERT` weights can be imported via `import_hf_bert_params`.
"""
from __future__ import annotations

import contextlib
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.ops.masked import masked_max, masked_mean

# Trace-time chunk-packing capacity (0 = off). The reference only runs BERT
# over each patient's REAL note chunks (Python chunk_bs minibatches over a
# ragged list, encoders.py:449-472); the static [B,S] grid instead pays for
# every padded chunk. Packing restores that parity with static shapes: gather
# the valid chunks to the front of a [capacity, L] buffer, run BERT on that,
# and scatter back — output is identical because padded chunks are zeroed by
# chunk_mask either way. `capacity` must be >= the number of valid chunks in
# the batch (the train loop computes it host-side and buckets it so only a
# handful of program shapes ever compile); it is a TRACE-time constant, hence
# a context + static jit arg rather than a tensor.
_NOTE_PACK: int = 0


@contextlib.contextmanager
def note_pack_capacity(capacity: int):
    """Set the chunk-packing capacity for modules traced inside the context."""
    global _NOTE_PACK
    prev = _NOTE_PACK
    _NOTE_PACK = int(capacity or 0)
    try:
        yield
    finally:
        _NOTE_PACK = prev


class BertSelfAttentionBlock(nn.Module):
    hidden: int
    heads: int
    dropout: float = 0.0
    int8: bool = False
    frozen_fast_path: bool = False  # no gradient flows here (frozen body) ->
    # packed-layout flash eligible (models/attention.py)
    ln: str = "fp32"  # fp32 | bf16 LN epilogue (encoder.bert_ln; ops/layernorm.py)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask, deterministic=True):
        from multimodalrouting_tpu.models.attention import MultiheadAttention

        h = MultiheadAttention(
            d=self.hidden,
            num_heads=self.heads,
            dropout=self.dropout,
            int8=self.int8,
            frozen_fast_path=self.frozen_fast_path,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(x, x, x, kv_mask=attn_mask, deterministic=deterministic)
        h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        from multimodalrouting_tpu.ops.layernorm import bert_layer_norm

        return bert_layer_norm(
            self.ln, epsilon=1e-12, dtype=self.dtype, param_dtype=self.param_dtype, name="ln"
        )(x + h)


class BertLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    dropout: float = 0.0
    int8: bool = False
    frozen_fast_path: bool = False
    gelu: str = "erf"  # erf | tanh | poly (encoder.bert_gelu; ops/gelu.py)
    ln: str = "fp32"  # fp32 | bf16 LN epilogue (encoder.bert_ln)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask, deterministic=True):
        if self.int8:
            from multimodalrouting_tpu.ops.quant import QuantDense as _Dense
        else:
            _Dense = nn.Dense
        x = BertSelfAttentionBlock(
            hidden=self.hidden,
            heads=self.heads,
            dropout=self.dropout,
            int8=self.int8,
            frozen_fast_path=self.frozen_fast_path,
            ln=self.ln,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attention",
        )(x, attn_mask, deterministic)
        h = _Dense(self.intermediate, dtype=self.dtype, param_dtype=self.param_dtype, name="intermediate")(x)
        # "erf" = exact GELU, matching HF BertIntermediate bit-for-bit (golden
        # parity default). XLA's erf lowering costs ~17% of the whole step on
        # this build (PERF.md "GELU lowering"); "poly" recovers that as a
        # fused FMA chain at <=5e-5 deviation (bf16-identical for x >= -2.8),
        # "tanh" is the coarser (~3e-3) standard approximation.
        from multimodalrouting_tpu.ops.gelu import apply_gelu

        h = apply_gelu(h, self.gelu)
        h = _Dense(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="output")(h)
        h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        from multimodalrouting_tpu.ops.layernorm import bert_layer_norm

        return bert_layer_norm(
            self.ln, epsilon=1e-12, dtype=self.dtype, param_dtype=self.param_dtype, name="ln"
        )(x + h)


class BertEncoder(nn.Module):
    """BERT-base-style encoder over token ids [N, L] -> hidden states [N, L, H]."""

    vocab_size: int = 28996
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    dropout: float = 0.0
    remat: bool = False  # rematerialize per layer (jax.checkpoint) to trade
    # FLOPs for HBM when fine-tuning with large chunk grids
    int8: bool = False  # run the six big per-layer matmuls on the int8 MXU
    # path (inference-only; see ops/quant.py)
    frozen_fast_path: bool = False  # no gradient flows through this encoder
    # (caller stop-gradients its output) -> packed-layout flash eligible
    gelu: str = "erf"  # erf | tanh | poly FFN activation (encoder.bert_gelu)
    ln: str = "fp32"  # fp32 | bf16 LN epilogue (encoder.bert_ln; the pp
    # pipeline path keeps its own fp32 LN islands regardless)
    pipeline: bool = False  # stacked-param layer stack, GPipe-pipelined over
    # the 'model' mesh axis when pp mode is on (parallel/pp.py)
    pp_microbatches: int = 0  # microbatches per data shard (0 = stage count)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True):
        n, length = input_ids.shape
        word = nn.Embed(
            self.vocab_size, self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="word_embeddings"
        )(input_ids)
        pos_ids = jnp.arange(length)[None, :]
        pos = nn.Embed(
            self.max_position, self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="position_embeddings"
        )(pos_ids)
        typ = nn.Embed(
            self.type_vocab, self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="token_type_embeddings"
        )(jnp.zeros_like(input_ids))
        x = word + pos + typ
        from multimodalrouting_tpu.ops.layernorm import bert_layer_norm

        x = bert_layer_norm(
            self.ln, epsilon=1e-12, dtype=self.dtype, param_dtype=self.param_dtype, name="embed_ln"
        )(x)
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        if self.pipeline:
            # stacked-param layer stack (pipeline-parallel layout). Runs as a
            # GPipe pipeline over the 'model' axis when pp mode is active,
            # sequential lax.scan otherwise — see parallel/pp.py.
            if self.int8:
                raise ValueError("pipeline BERT does not compose with int8")
            from multimodalrouting_tpu.parallel.pp import PipelinedBertLayers

            return PipelinedBertLayers(
                layers=self.layers,
                hidden=self.hidden,
                heads=self.heads,
                intermediate=self.intermediate,
                n_micro=self.pp_microbatches,
                remat=self.remat,
                gelu=self.gelu,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="pp_layers",
            )(x, attention_mask)
        layer_cls = nn.remat(BertLayer, static_argnums=(2,)) if self.remat else BertLayer
        for i in range(self.layers):
            x = layer_cls(
                hidden=self.hidden,
                heads=self.heads,
                intermediate=self.intermediate,
                dropout=self.dropout,
                int8=self.int8,
                frozen_fast_path=self.frozen_fast_path,
                gelu=self.gelu,
                ln=self.ln,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(x, attention_mask, deterministic)
        return x


class BioClinBERTEncoder(nn.Module):
    """Chunk-batched clinical note encoder.

    Input: {"input_ids": [B,S,L], "attention_mask": [B,S,L],
            "chunk_mask": [B,S]} (pretokenized; the canonical path in the
            reference too — main.py:965-999 _detect_notes_schema).
    Output: (H [B,S,d], chunk_mask [B,S], pooled [B,d]).
    """

    d: int = 256
    note_agg: str = "cls"  # cls | mean | max (token-level aggregation per chunk)
    chunk_agg: str = "mean"  # mean | max pooling over the chunk axis
    # (reference encoder_atten.py:277-287 supports both, with its mean/max
    # branch labels swapped — SURVEY §2.5; names here mean what they say)
    finetune_text: bool = False
    int8: bool = False  # int8 MXU matmuls for the frozen BERT body; requires
    # finetune_text=False (the quantized matmuls carry no useful gradient)
    pipeline: bool = False  # GPipe layer-stage layout (parallel/pp.py)
    pp_microbatches: int = 0
    remat: bool = False
    gelu: str = "erf"  # erf | tanh | poly FFN activation (encoder.bert_gelu)
    ln: str = "fp32"  # fp32 | bf16 LN epilogue (encoder.bert_ln)
    vocab_size: int = 28996
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        notes: Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        input_ids = notes["input_ids"]
        attn = notes["attention_mask"]
        if input_ids.ndim == 2:  # [B,L] -> [B,1,L]
            input_ids = input_ids[:, None, :]
            attn = attn[:, None, :]
        b, s, length = input_ids.shape

        chunk_mask = notes.get("chunk_mask")
        if chunk_mask is None:
            chunk_mask = (jnp.sum(attn, axis=-1) > 0).astype(jnp.float32)
        chunk_mask = chunk_mask.astype(jnp.float32)

        if notes.get("chunk_embs") is not None:
            # precomputed frozen-BERT chunk embeddings (the TPU analogue of
            # the reference's precomputed-embedding CSV workflow,
            # 01_BioClinicalBert.py): skip the BERT body entirely — valid
            # only when the body is frozen, since the cache would go stale
            # under fine-tuning
            if self.finetune_text:
                raise ValueError(
                    "notes['chunk_embs'] (encoder.text_embedding_cache) "
                    "requires finetune_text=False — a fine-tuned BERT body "
                    "invalidates the cache every step"
                )
            return self._project_and_pool(
                notes["chunk_embs"].astype(self.dtype).reshape(b * s, -1),
                chunk_mask, b, s,
            )

        flat_ids = input_ids.reshape(b * s, length)
        flat_attn = attn.reshape(b * s, length)

        # chunk packing (see note_pack_capacity above): BERT only sees the
        # valid chunks, gathered to the front of a [cap, L] buffer
        cap = _NOTE_PACK
        packed = 0 < cap < b * s
        if packed:
            order = jnp.argsort(-chunk_mask.reshape(b * s))  # stable: valid first
            pack_idx = order[:cap]
            flat_ids = jnp.take(flat_ids, pack_idx, axis=0)
            flat_attn = jnp.take(flat_attn, pack_idx, axis=0)

        # sequence parallelism: shard the flattened chunk axis across the
        # whole ('data','model') mesh — the B*S independent 512-token chunks
        # are the natural unit of parallelism for the dominant BERT compute.
        # Under tensor parallelism (parallel/tp.py) 'model' shards the BERT
        # weights instead, under pipeline parallelism (parallel/pp.py) it
        # holds layer stages, and under route parallelism (parallel/ep.py)
        # it holds MULT cross streams — in all three the chunk axis takes
        # 'data' only.
        from multimodalrouting_tpu.parallel.mesh import (
            DATA_AXIS,
            MODEL_AXIS,
            constrain,
            ep_enabled,
            pp_enabled,
            tp_enabled,
        )

        chunk_axes = (
            (DATA_AXIS,)
            if (tp_enabled() or pp_enabled() or ep_enabled())
            else (DATA_AXIS, MODEL_AXIS)
        )
        flat_ids = constrain(flat_ids, chunk_axes)
        flat_attn = constrain(flat_attn, chunk_axes)

        if self.int8 and self.finetune_text:
            raise ValueError(
                "int8 frozen-BERT path requires finetune_text=False "
                "(quantized matmuls are inference-only)"
            )
        hidden = BertEncoder(
            vocab_size=self.vocab_size,
            hidden=self.hidden,
            layers=self.layers,
            heads=self.heads,
            intermediate=self.intermediate,
            max_position=self.max_position,
            type_vocab=self.type_vocab,
            dropout=self.dropout,
            remat=self.remat,
            int8=self.int8,
            # frozen body: output is stop-gradiented below, so packed flash
            # needs no backward at all; fine-tuned bodies also take the
            # packed path when its pallas backward covers the shape
            # (models/attention.py, flash_packed.supports_packed_bwd)
            frozen_fast_path=not self.finetune_text,
            gelu=self.gelu,
            ln=self.ln,
            pipeline=self.pipeline,
            pp_microbatches=self.pp_microbatches,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bert",
        )(flat_ids, flat_attn, deterministic=deterministic)  # [B*S, L, H]

        agg = self.note_agg
        if agg == "cls":
            emb = hidden[:, 0]
        elif agg == "max":
            emb = masked_max(hidden, flat_attn)
        else:
            emb = masked_mean(hidden, flat_attn)

        if not packed:
            # cache tap (train/text_cache.py): the per-chunk BERT embedding
            # BEFORE the trainable projection — exactly what the cached path
            # consumes via notes["chunk_embs"]
            self.sow("intermediates", "chunk_embs", emb.reshape(b, s, -1))

        return self._project_and_pool(
            emb, chunk_mask, b, s, pack_idx=pack_idx if packed else None
        )

    def _project_and_pool(self, emb, chunk_mask, b, s, pack_idx=None):
        """Shared tail: stop-grad (frozen body), proj to d, unpack, pool."""
        if not self.finetune_text:
            # frozen-BERT default (reference: main.py:2801-2807) — XLA prunes
            # the entire BERT backward pass
            emb = jax.lax.stop_gradient(emb)

        if self.d != self.hidden:
            emb = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_ln")(emb)
            emb = nn.Dense(
                self.d, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="proj"
            )(emb)

        if pack_idx is not None:
            # scatter back to the full [B*S] chunk grid; slots not written
            # (and any pack slots that landed on padded chunks) are zeroed by
            # the chunk_mask multiply below
            emb = (
                jnp.zeros((b * s, emb.shape[-1]), emb.dtype)
                .at[pack_idx]
                .set(emb, mode="drop")
            )

        h = emb.reshape(b, s, -1)
        h = h * chunk_mask[..., None].astype(h.dtype)
        if self.chunk_agg == "max":
            pooled = masked_max(h, chunk_mask)
        else:
            pooled = masked_mean(h, chunk_mask)
        return h, chunk_mask, pooled


def import_hf_bert_params(state_dict, layers: int) -> Dict:
    """Convert a HuggingFace BERT (torch state_dict, CPU) to this module's
    param pytree. Works with `emilyalsentzer/Bio_ClinicalBERT` when its
    weights are available locally; the framework trains fine from scratch
    otherwise."""
    import numpy as np

    def t(name):
        return np.asarray(state_dict[name].detach().cpu().numpy())

    def lin(prefix):
        return {"kernel": t(f"{prefix}.weight").T, "bias": t(f"{prefix}.bias")}

    params: Dict = {
        "word_embeddings": {"embedding": t("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": t("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": t("embeddings.token_type_embeddings.weight")},
        "embed_ln": {
            "scale": t("embeddings.LayerNorm.weight"),
            "bias": t("embeddings.LayerNorm.bias"),
        },
    }
    for i in range(layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "attn": {
                    "q_proj": lin(f"{p}.attention.self.query"),
                    "k_proj": lin(f"{p}.attention.self.key"),
                    "v_proj": lin(f"{p}.attention.self.value"),
                    "out_proj": lin(f"{p}.attention.output.dense"),
                },
                "ln": {
                    "scale": t(f"{p}.attention.output.LayerNorm.weight"),
                    "bias": t(f"{p}.attention.output.LayerNorm.bias"),
                },
            },
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "ln": {
                "scale": t(f"{p}.output.LayerNorm.weight"),
                "bias": t(f"{p}.output.LayerNorm.bias"),
            },
        }
    return params
