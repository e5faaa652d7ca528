"""Pre-LN (MulT-style) transformer encoder with cross-attention support.

Behavioral parity target: reference MIMIC-IV/MortModel/Paired_Cross_Attention/
transformer.py:11-248 —
  * input scaled by sqrt(d) + fairseq sinusoidal positions,
  * pre-LN layers where the query LayerNorm is also applied to cross-attn
    keys/values (transformer.py:188-189),
  * query-mask zeroing after every block so PAD rows stay exactly zero,
  * ReLU FFN of width 4d, final stack LayerNorm.

TPU-first: batch-first [B, T, D], static shapes, and a `StackedMulT` wrapper
that evaluates G parameter-independent stacks as ONE vmapped program — this is
how all 9 directional route streams become a single fused XLA computation
instead of the reference's 9 sequential module calls.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.models.attention import (
    MultiheadAttention,
    future_mask,
    sinusoidal_positions,
)


class MulTEncoderLayer(nn.Module):
    d: int
    num_heads: int = 4
    attn_dropout: float = 0.1
    relu_dropout: float = 0.1
    res_dropout: float = 0.1
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_k: Optional[jnp.ndarray] = None,
        x_v: Optional[jnp.ndarray] = None,
        q_mask: Optional[jnp.ndarray] = None,
        kv_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        attn_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        ln0 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln0")
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln1")
        drop = lambda rate: nn.Dropout(rate=rate, deterministic=deterministic)  # noqa: E731

        q_keep = None
        if q_mask is not None:
            q_keep = q_mask.astype(x.dtype)[..., None]  # [B,Tq,1]

        cross = x_k is not None
        key_mask = kv_mask if cross else q_mask

        # --- attention block (pre-LN) ---
        residual = x
        h = ln0(x)
        if q_keep is not None:
            h = h * q_keep
        if cross:
            k = ln0(x_k)  # the query block's LN is reused on keys/values
            v = ln0(x_v)
        else:
            k = v = h
        # explicit bias (e.g. a native-length causal offset over a padded
        # grid, models/route_mult.py) overrides the shape-derived one
        if attn_bias is not None:
            bias = attn_bias
        else:
            bias = future_mask(h.shape[-2], k.shape[-2]) if self.causal else None
        h = MultiheadAttention(
            d=self.d,
            num_heads=self.num_heads,
            dropout=self.attn_dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(h, k, v, kv_mask=key_mask, attn_bias=bias, deterministic=deterministic)
        x = residual + drop(self.res_dropout)(h)
        if q_keep is not None:
            x = x * q_keep

        # --- FFN block (pre-LN, ReLU, 4x width) ---
        residual = x
        h = ln1(x)
        if q_keep is not None:
            h = h * q_keep
        h = nn.Dense(
            4 * self.d,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc1",
        )(h)
        h = nn.relu(h)
        h = drop(self.relu_dropout)(h)
        h = nn.Dense(
            self.d,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc2",
        )(h)
        x = residual + drop(self.res_dropout)(h)
        if q_keep is not None:
            x = x * q_keep
        return x


class MulTEncoder(nn.Module):
    """Stack of MulTEncoderLayers over batch-first [B, T, D] sequences."""

    d: int
    num_heads: int
    layers: int
    attn_dropout: float = 0.0
    relu_dropout: float = 0.0
    res_dropout: float = 0.0
    embed_dropout: float = 0.0
    causal: bool = False
    use_positional: bool = True
    positions: str = "sinusoidal"  # sinusoidal | ref_quantized (reference
    # defect parity: integer-truncated table, see attention.sinusoidal_positions)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_in: jnp.ndarray,
        x_in_k: Optional[jnp.ndarray] = None,
        x_in_v: Optional[jnp.ndarray] = None,
        q_mask: Optional[jnp.ndarray] = None,
        kv_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        attn_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        scale = jnp.asarray(self.d, jnp.float32) ** 0.5
        drop = nn.Dropout(rate=self.embed_dropout, deterministic=deterministic)

        def embed(seq):
            h = (scale * seq.astype(jnp.float32)).astype(self.dtype)
            if self.use_positional:
                pos = sinusoidal_positions(
                    seq.shape[-2],
                    self.d,
                    dtype=self.dtype,
                    quantized=self.positions == "ref_quantized",
                )
                h = h + pos[None]
            return drop(h)

        x = embed(x_in)
        if q_mask is not None:
            x = x * q_mask.astype(x.dtype)[..., None]

        cross = x_in_k is not None and x_in_v is not None
        x_k = embed(x_in_k) if cross else None
        x_v = embed(x_in_v) if cross else None

        for i in range(self.layers):
            x = MulTEncoderLayer(
                d=self.d,
                num_heads=self.num_heads,
                attn_dropout=self.attn_dropout,
                relu_dropout=self.relu_dropout,
                res_dropout=self.res_dropout,
                causal=self.causal,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(
                x,
                x_k if cross else None,
                x_v if cross else None,
                q_mask=q_mask,
                kv_mask=kv_mask if cross else q_mask,
                deterministic=deterministic,
                attn_bias=attn_bias,
            )

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="final_ln")(x)
        if q_mask is not None:
            x = x * q_mask.astype(x.dtype)[..., None]
        return x


def make_stacked_mult(cross: bool) -> type:
    """G parameter-independent MulT stacks evaluated as one vmapped program.

    Inputs gain a leading stream axis: x [G,B,T,D], masks [G,B,T]. Parameters
    get an extra leading G axis (variable_axes={'params': 0}), so one XLA
    program computes all G streams — the fused replacement for the
    reference's trans_l_with_n / trans_l_with_i / ... sequential modules
    (reference: mult_model.py:34-45).
    """
    if cross:
        in_axes = (0, 0, 0, 0, 0)
    else:
        in_axes = (0, None, None, 0, None)
    return nn.vmap(
        MulTEncoder,
        in_axes=in_axes + (None,),
        out_axes=0,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
    )


StackedSelfMulT = make_stacked_mult(cross=False)
StackedCrossMulT = make_stacked_mult(cross=True)

#: cross variant with a per-stream attention bias [G, Tq, Tk] — used by the
#: per-route MulT family to keep each stream's NATIVE-length causal offset
#: (1 + |Tk - Tq|) after padding all streams to a common T
StackedCrossMulTBias = nn.vmap(
    MulTEncoder,
    in_axes=(0, 0, 0, 0, 0, None, 0),
    out_axes=0,
    variable_axes={"params": 0},
    split_rngs={"params": True, "dropout": True},
)
