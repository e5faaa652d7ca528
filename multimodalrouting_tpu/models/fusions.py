"""Route fusion families for the 7-route taxonomy.

Parity targets:
  * Rich-feature MLP fusions — reference MIMIC-IV/Model/routing_and_heads.py:
    38-90 (PairwiseFusion / TrimodalFusion with [za,zb,za*zb,|za-zb|]
    features, learnable residual scale).
  * Pure-linear fusions — MIMIC-IV/MortModel/routing_and_heads.py:60-167
    (bias-free Linear(2d->d) / Linear(3d->d)).
  * Bidirectional cross-attn fusions — MIMIC-IV/Model/routing_and_heads.py:
    93-174 (CrossModalEncoder / TrimodalCrossEncoder; the reference's
    TrimodalCrossEncoder has a latent NameError — fixed here, see SURVEY §2.5).
  * Lightweight directional cross-attn fusion (missing-modality safe) —
    MIMIC-IV/PhenoModel/Partial/Cross_Attention/routing_and_heads.py:10-249.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.models.attention import MultiheadAttention
from multimodalrouting_tpu.ops.masked import masked_mean


class MLPBlock(nn.Module):
    """LN -> Linear -> GELU -> Dropout stack ending LN -> Linear.

    Reference _MLP (Model/routing_and_heads.py:12-35); default hidden
    [4*out, 2*out].
    """

    out_dim: int
    hidden: Optional[Sequence[int]] = None
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        hidden = list(self.hidden) if self.hidden is not None else [4 * self.out_dim, 2 * self.out_dim]
        dims = hidden + [self.out_dim]
        for i, h in enumerate(dims[:-1]):
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=f"ln_{i}")(x)
            x = nn.Dense(h, dtype=self.dtype, param_dtype=self.param_dtype, name=f"fc_{i}")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Dropout(rate=self.p_drop, deterministic=deterministic)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln_out")(x)
        x = nn.Dense(dims[-1], dtype=self.dtype, param_dtype=self.param_dtype, name="fc_out")(x)
        return x


class PairwiseFusion(nn.Module):
    """MLP pair fusion with rich features + learnable residual scale."""

    d: int
    feature_mode: str = "rich"  # concat | rich
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, za, zb, deterministic=True):
        if self.feature_mode == "concat":
            x = jnp.concatenate([za, zb], axis=-1)
        else:
            x = jnp.concatenate([za, zb, za * zb, jnp.abs(za - zb)], axis=-1)
        h = MLPBlock(out_dim=self.d, p_drop=self.p_drop, dtype=self.dtype, param_dtype=self.param_dtype, name="mlp")(
            x, deterministic
        )
        res_scale = self.param("res_scale", nn.initializers.constant(0.5), ())
        return h + res_scale.astype(h.dtype) * 0.5 * (za + zb)


class TrimodalFusion(nn.Module):
    d: int
    feature_mode: str = "rich"
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, zl, zn, zi, deterministic=True):
        if self.feature_mode == "concat":
            x = jnp.concatenate([zl, zn, zi], axis=-1)
        else:
            x = jnp.concatenate([zl, zn, zi, zl * zn, zl * zi, zn * zi, zl * zn * zi], axis=-1)
        h = MLPBlock(out_dim=self.d, p_drop=self.p_drop, dtype=self.dtype, param_dtype=self.param_dtype, name="mlp")(
            x, deterministic
        )
        res_scale = self.param("res_scale", nn.initializers.constant(0.5), ())
        return h + res_scale.astype(h.dtype) * (zl + zn + zi) / 3.0


class LinearPairFusion(nn.Module):
    """Bias-free Linear(2d->d) — capsule-variant fusion (MortModel)."""

    d: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, za, zb, deterministic=True):
        return nn.Dense(self.d, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)(
            jnp.concatenate([za, zb], axis=-1)
        )


class LinearTriFusion(nn.Module):
    d: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, zl, zn, zi, deterministic=True):
        return nn.Dense(self.d, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)(
            jnp.concatenate([zl, zn, zi], axis=-1)
        )


class CrossAttnPairBlock(nn.Module):
    """One bidirectional cross-attention layer over single-token sequences."""

    d: int
    n_heads: int = 4
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xa, xb, deterministic=True):
        drop = nn.Dropout(rate=self.p_drop, deterministic=deterministic)
        norm_a = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="norm_a")
        norm_b = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="norm_b")
        mha = lambda name: MultiheadAttention(  # noqa: E731
            d=self.d, num_heads=self.n_heads, dropout=self.p_drop,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        ff = lambda name: MLPBlock(  # noqa: E731
            out_dim=self.d, hidden=[4 * self.d], p_drop=self.p_drop,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        q, k = norm_a(xa), norm_b(xb)
        xa = xa + drop(mha("a2b")(q, k, k, deterministic=deterministic))
        xa = xa + drop(ff("ff_a")(xa, deterministic))
        q, k = norm_b(xb), norm_a(xa)
        xb = xb + drop(mha("b2a")(q, k, k, deterministic=deterministic))
        xb = xb + drop(ff("ff_b")(xb, deterministic))
        return xa, xb


class CrossModalEncoder(nn.Module):
    """Pairwise fusion via bidirectional cross-attn on [B,1,d] tokens."""

    d: int
    n_layers: int = 2
    n_heads: int = 4
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, za, zb, deterministic=True):
        xa, xb = za[:, None, :], zb[:, None, :]
        for i in range(self.n_layers):
            xa, xb = CrossAttnPairBlock(
                d=self.d, n_heads=self.n_heads, p_drop=self.p_drop,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"block_{i}",
            )(xa, xb, deterministic)
        h = jnp.concatenate([xa, xb], axis=-1)[:, 0]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="pool_ln")(h)
        return nn.Dense(self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="pool_fc")(h)


class TrimodalCrossEncoder(nn.Module):
    """Round-robin trimodal cross-attn (L<->N, L<->I, N<->I per layer)."""

    d: int
    n_layers: int = 2
    n_heads: int = 4
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, zl, zn, zi, deterministic=True):
        xl, xn, xi = zl[:, None, :], zn[:, None, :], zi[:, None, :]
        for i in range(self.n_layers):
            blk = CrossAttnPairBlock(
                d=self.d, n_heads=self.n_heads, p_drop=self.p_drop,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"block_{i}",
            )
            xl, xn = blk(xl, xn, deterministic)
            xl, xi = blk(xl, xi, deterministic)
            xn, xi = blk(xn, xi, deterministic)
        h = jnp.concatenate([xl, xn, xi], axis=-1)[:, 0]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="pool_ln0")(h)
        h = nn.Dense(4 * self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="pool_fc0")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(rate=self.p_drop, deterministic=deterministic)(h)
        h = nn.Dense(self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="pool_fc1")(h)
        res_scale = self.param("res_scale", nn.initializers.constant(0.5), ())
        return h + res_scale.astype(h.dtype) * (zl + zn + zi) / 3.0


class DirectionalCrossAttnFusion(nn.Module):
    """Missing-modality-safe directional cross-attn fusion A <- B over
    sequences; when B has no valid tokens the pooled state is zeroed before
    the final out projection, so missing-B samples map to out(0) — a learned
    constant, exactly as the reference.

    Reference: PhenoModel/Partial/Cross_Attention/routing_and_heads.py:104-172
    (golden-tested in tests/test_reference_parity_gated.py).
    """

    d: int
    n_heads: int = 4
    p_drop: float = 0.1
    pool: str = "mean"  # mean | first
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a_seq, a_mask, b_seq, b_mask, deterministic=True):
        h = MultiheadAttention(
            d=self.d, num_heads=self.n_heads, dropout=self.p_drop,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(a_seq, b_seq, b_seq, kv_mask=b_mask, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="post_ln")(a_seq + h)
        ff = nn.Dense(4 * self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="ff1")(h)
        ff = nn.relu(ff)  # reference uses ReLU in this fusion's FF (:126)
        ff = nn.Dense(self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="ff2")(ff)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="out_ln")(h + ff)
        if self.pool == "first":
            # first VALID query token, falling back to 0 (:163-170)
            has_any = jnp.sum(a_mask, axis=1) > 0
            idx = jnp.where(has_any, jnp.argmax(a_mask > 0.5, axis=1), 0)
            z = jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0]
        else:
            z = masked_mean(h, a_mask)
        # zero when B empty, THEN the out projection — missing-B samples map
        # to out(0), a learned constant, exactly as the reference (:171-172);
        # unlike the reference, fully-masked attention here stays finite (its
        # torch MHA emits NaN rows that the zeroing cannot remove)
        b_any = (jnp.sum(b_mask, axis=1) > 0).astype(z.dtype)[:, None]
        z = z * b_any
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj_ln")(z)
        return nn.Dense(self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj_fc")(z)


class TriTokenAttentionFusion(nn.Module):
    """Learned query token attending over concat([L_seq, N_seq, I_seq]).

    Reference: PhenoModel/Partial/Cross_Attention/routing_and_heads.py:174-206.
    """

    d: int
    n_heads: int = 4
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, l_seq, l_mask, n_seq, n_mask, i_seq, i_mask, deterministic=True):
        b = l_seq.shape[0]
        query = self.param("query", nn.initializers.normal(0.02), (1, 1, self.d), self.param_dtype)
        kv = jnp.concatenate([l_seq, n_seq, i_seq], axis=1)
        kv_mask = jnp.concatenate([l_mask, n_mask, i_mask], axis=1)
        kv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln_kv")(kv)
        q = jnp.broadcast_to(query.astype(kv.dtype), (b, 1, self.d))
        h = MultiheadAttention(
            d=self.d, num_heads=self.n_heads, dropout=self.p_drop,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(q, kv, kv, kv_mask=kv_mask, deterministic=deterministic)[:, 0]
        # zero when no valid kv tokens, then the out projection (reference
        # :201-206: z = z * validKV; return self.out(z))
        any_tok = (jnp.sum(kv_mask, axis=1) > 0).astype(h.dtype)[:, None]
        h = h * any_tok
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj_ln")(h)
        return nn.Dense(self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj_fc")(h)


class SevenRouteFusion(nn.Module):
    """Build the 7-route embedding dict from pooled unimodal embeddings.

    make_route_inputs parity (Model/routing_and_heads.py:183-197) with the
    fusion family selected by `bi_fusion_mode`/`tri_fusion_mode`
    (mlp | attn | linear).
    """

    d: int
    feature_mode: str = "rich"
    bi_fusion_mode: str = "mlp"
    tri_fusion_mode: str = "mlp"
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, zl, zn, zi, deterministic=True) -> Dict[str, jnp.ndarray]:
        def pair(name):
            if self.bi_fusion_mode == "attn":
                return CrossModalEncoder(
                    d=self.d, p_drop=self.p_drop, dtype=self.dtype, param_dtype=self.param_dtype, name=name
                )
            if self.bi_fusion_mode == "linear":
                return LinearPairFusion(d=self.d, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
            return PairwiseFusion(
                d=self.d, feature_mode=self.feature_mode, p_drop=self.p_drop,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )

        if self.tri_fusion_mode == "attn":
            tri = TrimodalCrossEncoder(
                d=self.d, p_drop=self.p_drop, dtype=self.dtype, param_dtype=self.param_dtype, name="LNI"
            )
        elif self.tri_fusion_mode == "linear":
            tri = LinearTriFusion(d=self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="LNI")
        else:
            tri = TrimodalFusion(
                d=self.d, feature_mode=self.feature_mode, p_drop=self.p_drop,
                dtype=self.dtype, param_dtype=self.param_dtype, name="LNI",
            )

        return {
            "L": zl,
            "N": zn,
            "I": zi,
            "LN": pair("LN")(zl, zn, deterministic),
            "LI": pair("LI")(zl, zi, deterministic),
            "NI": pair("NI")(zn, zi, deterministic),
            "LNI": tri(zl, zn, zi, deterministic),
        }
