"""BEHRT-style structured EHR time-series encoder.

Behavioral parity target: reference MIMIC-IV/MortModel/Paired_Cross_Attention/
encoders.py:57-251 (BEHRTLabEncoder) — linear projection of [B,T,F] lab
matrices, learned positions over a STATIC max length (the reference's
dynamic-`self.pos`-reallocation defect at MIMIC-IV/Model/encoders.py:61-67 is
deliberately not reproduced; see SURVEY.md §2.5), optional CLS token,
post-LN torch-default transformer layers (ReLU, 4d FFN), and an output head
LayerNorm -> Linear -> activation. `encode_seq_and_pool` returns
(seq [B,T,D], mask [B,T], pooled [B,D]) in one pass.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.models.attention import MultiheadAttention
from multimodalrouting_tpu.ops.masked import masked_last, masked_mean


class PostLNEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer defaults: post-LN, ReLU, 4d FFN."""

    d: int
    num_heads: int
    dropout: float = 0.0
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        drop = nn.Dropout(rate=self.dropout, deterministic=deterministic)
        h = MultiheadAttention(
            d=self.d,
            num_heads=self.num_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(x, x, x, kv_mask=key_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln1")(
            x + drop(h)
        )
        act = nn.relu if self.activation == "relu" else nn.gelu
        h = nn.Dense(4 * self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(x)
        h = drop(act(h))
        h = nn.Dense(self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln2")(
            x + drop(h)
        )


class BEHRTLabEncoder(nn.Module):
    n_feats: int
    d: int
    seq_len: int = 48
    n_layers: int = 2
    n_heads: int = 8
    pool: str = "cls"  # last | mean | cls
    activation: str = "relu"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: [B,T,F] (or [B,T] -> auto-expanded); mask: [B,T] (1 = valid).

        Returns (seq [B,T,D] without CLS, mask [B,T], pooled [B,D]).
        """
        if x.ndim == 2:
            x = x[..., None]
        b, t, f = x.shape
        if t > self.seq_len:
            raise ValueError(f"T={t} exceeds static seq_len={self.seq_len}")
        if mask is None:
            mask = jnp.ones((b, t), dtype=jnp.float32)

        pos = self.param(
            "pos",
            nn.initializers.normal(stddev=0.02),
            (1, self.seq_len, self.d),
            self.param_dtype,
        )
        h = nn.Dense(
            self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="input_proj"
        )(x.astype(self.dtype))
        h = h + pos[:, :t].astype(self.dtype)

        use_cls = self.pool == "cls"
        if use_cls:
            cls_tok = self.param(
                "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, self.d), self.param_dtype
            )
            h = jnp.concatenate([jnp.broadcast_to(cls_tok.astype(self.dtype), (b, 1, self.d)), h], axis=1)
            key_mask = jnp.concatenate([jnp.ones((b, 1), mask.dtype), mask], axis=1)
        else:
            key_mask = mask

        for i in range(self.n_layers):
            h = PostLNEncoderLayer(
                d=self.d,
                num_heads=self.n_heads,
                dropout=self.dropout,
                activation=self.activation,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(h, key_mask=key_mask, deterministic=deterministic)

        # output head LN -> Linear -> activation (reference encoders.py:110-114)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="out_ln")(h)
        h = nn.Dense(self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj")(h)
        h = nn.relu(h) if self.activation == "relu" else nn.gelu(h, approximate=False)

        if use_cls:
            cls_vec = h[:, 0]
            seq = h[:, 1:]
            pooled = cls_vec
        else:
            seq = h
            if self.pool == "last":
                pooled = masked_last(seq, mask)
            else:
                pooled = masked_mean(seq, mask)
        return seq, mask.astype(jnp.float32), pooled
