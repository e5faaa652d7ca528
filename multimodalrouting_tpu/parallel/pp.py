"""GPipe-style pipeline parallelism for the chunk-BERT layer stack.

The reference is single-device (SURVEY.md §2.4); parallel/mesh.py replicates
weights and shards the note-chunk axis, parallel/tp.py shards the weights
Megatron-style. This module supplies the third scale-out axis use: the
'model' mesh axis holds contiguous *stages* of the BERT layer stack, and the
flattened note-chunk grid flows through the stages as microbatches with
`jax.lax.ppermute` hops — the classic GPipe schedule, expressed TPU-natively
as one `jax.shard_map` program inside the jitted train step (no host
involvement, activations ride ICI).

Why this exists next to TP: tensor parallelism pays four all-reduces per
layer; pipelining pays ONE activation hop per stage boundary per microbatch
plus a (S-1)/(M+S-1) bubble. For deep frozen encoders with many independent
chunks (the chunk-BERT regime: M can equal the chunk count), the pipeline's
communication volume is far lower — it is the right layout when layers are
deep, chunks are plentiful, and ICI is the budget.

Param layout: pipelining wants per-layer params stacked on a leading
[n_layers, ...] axis (sharded over 'model' → each stage holds its slice).
`PipelinedBertLayers` declares exactly that, with per-slice initializers
matching models/clinbert.py:BertLayer, and `stack_bert_layer_params` /
`unstack_bert_layer_params` convert to/from the layered `layer_i/...`
checkpoint layout (HF imports and cross-layout warm starts go through these;
ckpt.restore_checkpoint auto-converts).

With no active mesh (or one model shard) the same stacked params run as a
plain `lax.scan` over layers — a PP-trained checkpoint evaluates and serves
on a single chip unchanged.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from multimodalrouting_tpu.ops.masked import NEG_INF
from multimodalrouting_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# stacked-leaf name -> path inside one BertLayer param subtree
# (models/clinbert.py BertLayer: attention.attn.{q,k,v,out}_proj, attention.ln,
#  intermediate, output, ln)
_LEAF_PATHS: Dict[str, tuple] = {
    "q_kernel": ("attention", "attn", "q_proj", "kernel"),
    "q_bias": ("attention", "attn", "q_proj", "bias"),
    "k_kernel": ("attention", "attn", "k_proj", "kernel"),
    "k_bias": ("attention", "attn", "k_proj", "bias"),
    "v_kernel": ("attention", "attn", "v_proj", "kernel"),
    "v_bias": ("attention", "attn", "v_proj", "bias"),
    "o_kernel": ("attention", "attn", "out_proj", "kernel"),
    "o_bias": ("attention", "attn", "out_proj", "bias"),
    "attn_ln_scale": ("attention", "ln", "scale"),
    "attn_ln_bias": ("attention", "ln", "bias"),
    "i_kernel": ("intermediate", "kernel"),
    "i_bias": ("intermediate", "bias"),
    "f_kernel": ("output", "kernel"),
    "f_bias": ("output", "bias"),
    "ln_scale": ("ln", "scale"),
    "ln_bias": ("ln", "bias"),
}


def _get_in(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set_in(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def layer_leaves_from_module(layer_params) -> Dict[str, Any]:
    """One BertLayer param subtree (`bert/layer_i/...`) -> flat leaf dict."""
    return {name: _get_in(layer_params, path) for name, path in _LEAF_PATHS.items()}


def stack_bert_layer_params(bert_params, n_layers: int) -> Dict[str, Any]:
    """Layered `{layer_i: ...}` bert params -> stacked `pp_layers` leaves."""
    out = {}
    for name, path in _LEAF_PATHS.items():
        out[name] = jnp.stack(
            [jnp.asarray(_get_in(bert_params[f"layer_{i}"], path)) for i in range(n_layers)]
        )
    return out


def unstack_bert_layer_params(leaves: Dict[str, Any]) -> Dict[str, Any]:
    """Stacked `pp_layers` leaves -> layered `{layer_i: ...}` subtrees."""
    n_layers = int(next(iter(leaves.values())).shape[0])
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        sub: Dict[str, Any] = {}
        for name, path in _LEAF_PATHS.items():
            _set_in(sub, path, jnp.asarray(leaves[name])[i])
        out[f"layer_{i}"] = sub
    return out


def to_pp_layout(bert_params: Dict[str, Any]) -> Dict[str, Any]:
    """Layered bert subtree ({embeddings..., layer_i: ...}) -> pipeline layout
    ({embeddings..., pp_layers: stacked leaves}). Non-layer keys pass through."""
    n_layers = sum(1 for k in bert_params if str(k).startswith("layer_"))
    out = {k: v for k, v in bert_params.items() if not str(k).startswith("layer_")}
    out["pp_layers"] = stack_bert_layer_params(bert_params, n_layers)
    return out


def from_pp_layout(bert_params: Dict[str, Any]) -> Dict[str, Any]:
    """Pipeline-layout bert subtree -> layered layout (inverse of to_pp_layout)."""
    out = {k: v for k, v in bert_params.items() if k != "pp_layers"}
    out.update(unstack_bert_layer_params(bert_params["pp_layers"]))
    return out


def _dense(x, kernel, bias, dtype):
    return x.astype(dtype) @ kernel.astype(dtype) + bias.astype(dtype)


def _layer_norm(x, scale, bias, dtype, eps=1e-12):
    # fp32 statistics island (fast-variance form, matching flax LayerNorm)
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y.astype(dtype) * scale.astype(dtype) + bias.astype(dtype)


def _self_attention(w, x, kv_mask, heads: int, dtype):
    n, length, hidden = x.shape
    hd = hidden // heads
    q = _dense(x, w["q_kernel"], w["q_bias"], dtype) * (hd**-0.5)
    k = _dense(x, w["k_kernel"], w["k_bias"], dtype)
    v = _dense(x, w["v_kernel"], w["v_bias"], dtype)
    q = q.reshape(n, length, heads, hd)
    k = k.reshape(n, length, heads, hd)
    v = v.reshape(n, length, heads, hd)

    from multimodalrouting_tpu.models.attention import _use_flash_attention
    from multimodalrouting_tpu.ops import flash

    impl = flash.attention_impl()
    if (
        _use_flash_attention()
        and impl != "xla"
        and flash.supports(length, length, hd)
        and flash.flash_available()
    ):
        if impl == "splash":
            out = flash.splash_self_attention(q, k, v, kv_mask).astype(dtype)
        else:
            out = flash.flash_self_attention(q, k, v, kv_mask).astype(dtype)
    else:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        keep = kv_mask.astype(bool)[:, None, None, :]
        logits = jnp.where(keep, logits, NEG_INF)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", jax.nn.softmax(logits, axis=-1).astype(dtype), v
        )
    out = out.reshape(n, length, hidden)
    return _dense(out, w["o_kernel"], w["o_bias"], dtype)


def bert_layer_fwd(w, x, kv_mask, *, heads: int, dtype, gelu: str = "erf"):
    """Functional BertLayer forward on one flat leaf dict (dropout-free —
    the pipeline serves the frozen/eval chunk-BERT regime; train-mode BERT
    dropout is 0.0 throughout this framework, matching encoder.dropout)."""
    h = _self_attention(w, x, kv_mask, heads, dtype)
    x = _layer_norm(x + h, w["attn_ln_scale"], w["attn_ln_bias"], dtype)
    h = _dense(x, w["i_kernel"], w["i_bias"], dtype)
    from multimodalrouting_tpu.ops.gelu import apply_gelu

    h = apply_gelu(h, gelu)
    h = _dense(h, w["f_kernel"], w["f_bias"], dtype)
    return _layer_norm(x + h, w["ln_scale"], w["ln_bias"], dtype)


def _scan_layers(
    w_stacked, x, kv_mask, *, heads: int, dtype, remat: bool = False, gelu: str = "erf"
):
    def step(h, w_i):
        return bert_layer_fwd(w_i, h, kv_mask, heads=heads, dtype=dtype, gelu=gelu), None

    if remat:  # per-layer rematerialization (model.remat), as in BertEncoder
        step = jax.checkpoint(step)
    return jax.lax.scan(step, x, w_stacked)[0]


def pipeline_apply(
    w_stacked,
    x,
    attn_mask,
    *,
    mesh,
    n_micro: int,
    heads: int,
    dtype,
    remat: bool = False,
    gelu: str = "erf",
):
    """Run the stacked layers as a GPipe pipeline over the 'model' axis.

    x: [N, L, H] embedded chunks (N = flattened chunk axis, sharded over
    'data'); w_stacked leaves: [n_layers, ...] sharded over 'model' (each
    stage holds n_layers/S contiguous layers). Returns hidden states
    [N, L, H], 'data'-sharded and replicated over 'model'.

    Schedule (S stages, M microbatches per data shard): tick t processes
    microbatch (t - stage) on each stage, ppermutes activations one stage
    forward, and the last stage emits microbatch t-(S-1). Bubble fraction is
    (S-1)/(M+S-1); gradients flow through the reversed schedule automatically
    (ppermute's transpose is the inverse hop).
    """
    n_stages = mesh.shape[MODEL_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    n = x.shape[0]

    # shard_map needs exact divisibility over 'data'; pad the chunk axis
    pad = (-n) % n_data
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        attn_mask = jnp.concatenate(
            [attn_mask, jnp.zeros((pad,) + attn_mask.shape[1:], attn_mask.dtype)], axis=0
        )
    n_loc = (n + pad) // n_data
    m = max(1, min(int(n_micro), n_loc))
    while n_loc % m:
        m -= 1

    def body(w_local, x_local, mask_local):
        stage = jax.lax.axis_index(MODEL_AXIS)
        length, hidden = x_local.shape[1:]
        mb = n_loc // m
        x_mb = x_local.reshape(m, mb, length, hidden)
        mask_mb = mask_local.reshape(m, mb, length)
        act = jnp.zeros((mb, length, hidden), x_local.dtype)
        out = jnp.zeros((m, mb, length, hidden), x_local.dtype)
        for t in range(m + n_stages - 1):
            if t < m:  # stage 0 injects microbatch t
                act = jnp.where(stage == 0, x_mb[t], act)
            # the microbatch at this stage this tick is t - stage (traced)
            mask_cur = jnp.take(
                mask_mb, jnp.clip(t - stage, 0, m - 1), axis=0
            )
            act = _scan_layers(
                w_local, act, mask_cur, heads=heads, dtype=dtype, remat=remat, gelu=gelu
            )
            j = t - (n_stages - 1)  # static: the microbatch the LAST stage holds
            if 0 <= j < m:
                out = out.at[j].set(jnp.where(stage == n_stages - 1, act, out[j]))
            if n_stages > 1 and t < m + n_stages - 2:
                act = jax.lax.ppermute(
                    act, MODEL_AXIS, [(i, i + 1) for i in range(n_stages - 1)]
                )
        # only the last stage wrote `out`; psum replicates it across stages
        out = jax.lax.psum(out, MODEL_AXIS)
        return out.reshape(n_loc, length, hidden)

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        # keep varying-manual-axes tracking ON: it is what makes the AD
        # transpose insert the cross-axis psums for the replicated operands
        # (w is replicated over 'data', x over 'model' — their cotangents
        # must sum over the other axis)
    )(w_stacked, x, attn_mask)
    return out[:n]


class PipelinedBertLayers(nn.Module):
    """The BERT layer stack with stacked [n_layers, ...] params.

    Runs as a GPipe pipeline over the active mesh's 'model' axis when
    pipeline-parallel mode is on (parallel/mesh.py:pp_enabled), and as a
    sequential `lax.scan` otherwise — same params, same numbers, so PP
    checkpoints evaluate/serve on one chip unchanged.
    """

    layers: int
    hidden: int
    heads: int
    intermediate: int
    n_micro: int = 0  # microbatches per data shard; 0 = number of stages
    remat: bool = False  # per-layer jax.checkpoint (model.remat)
    gelu: str = "erf"  # erf | tanh | poly FFN activation (encoder.bert_gelu)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask):
        xavier = nn.initializers.xavier_uniform()
        lecun = nn.initializers.lecun_normal()

        def stacked(init):
            # per-slice init: fan computed on the single-layer shape, one
            # fresh key per layer — matches the layered BertLayer init
            def f(key, shape, dtype):
                keys = jax.random.split(key, shape[0])
                return jnp.stack([init(k, shape[1:], dtype) for k in keys])

            return f

        h, i = self.hidden, self.intermediate
        L = self.layers
        spec = {
            "q_kernel": ((L, h, h), stacked(xavier)),
            "q_bias": ((L, h), nn.initializers.zeros),
            "k_kernel": ((L, h, h), stacked(xavier)),
            "k_bias": ((L, h), nn.initializers.zeros),
            "v_kernel": ((L, h, h), stacked(xavier)),
            "v_bias": ((L, h), nn.initializers.zeros),
            "o_kernel": ((L, h, h), stacked(xavier)),
            "o_bias": ((L, h), nn.initializers.zeros),
            "attn_ln_scale": ((L, h), nn.initializers.ones),
            "attn_ln_bias": ((L, h), nn.initializers.zeros),
            "i_kernel": ((L, h, i), stacked(lecun)),
            "i_bias": ((L, i), nn.initializers.zeros),
            "f_kernel": ((L, i, h), stacked(lecun)),
            "f_bias": ((L, h), nn.initializers.zeros),
            "ln_scale": ((L, h), nn.initializers.ones),
            "ln_bias": ((L, h), nn.initializers.zeros),
        }
        w = {
            name: self.param(name, init, shape, self.param_dtype)
            for name, (shape, init) in spec.items()
        }

        from multimodalrouting_tpu.parallel.mesh import get_active_mesh, pp_enabled

        mesh = get_active_mesh()
        if mesh is not None and pp_enabled() and mesh.shape[MODEL_AXIS] > 1:
            return pipeline_apply(
                w,
                x,
                attn_mask,
                mesh=mesh,
                n_micro=self.n_micro or mesh.shape[MODEL_AXIS],
                heads=self.heads,
                dtype=self.dtype,
                remat=self.remat,
                gelu=self.gelu,
            )
        return _scan_layers(
            w,
            x,
            attn_mask,
            heads=self.heads,
            dtype=self.dtype,
            remat=self.remat,
            gelu=self.gelu,
        )


def validate_pp(cfg, n_model: int) -> None:
    """Loud validation before any global mesh/pp state is published."""
    t = cfg.train
    e = cfg.encoder
    if t.tensor_parallel:
        raise ValueError(
            "train.pipeline_parallel and train.tensor_parallel both claim the "
            "'model' mesh axis — pick one"
        )
    if n_model < 2:
        raise ValueError(
            "train.pipeline_parallel needs train.num_model_shards >= 2 "
            f"(got {n_model}); with one shard there is nothing to pipeline"
        )
    if e.bert_layers % n_model:
        raise ValueError(
            f"train.pipeline_parallel needs encoder.bert_layers="
            f"{e.bert_layers} divisible by model shards ({n_model})"
        )
    if e.int8_text:
        raise ValueError("train.pipeline_parallel does not compose with encoder.int8_text")
    if e.dropout > 0.0:
        # the pipelined stack applies no in-layer dropout, so a layered run
        # with dropout>0 and a PP run would silently diverge in train mode
        raise ValueError(
            "the pipelined BERT stack is dropout-free; set encoder.dropout=0 "
            "to use train.pipeline_parallel"
        )


def pp_spec_for_path(path) -> P:
    """The stacked `pp_layers` leaves shard their leading (layer) axis over
    'model' so each stage holds exactly its layers; everything else
    replicated."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    return P(MODEL_AXIS) if "pp_layers" in names else P()


def pp_state_shardings(state: Any, mesh) -> Any:
    """NamedSharding tree for a TrainState under pipeline parallelism
    (see mesh.py:param_state_shardings)."""
    from multimodalrouting_tpu.parallel.mesh import param_state_shardings

    return param_state_shardings(state, mesh, pp_spec_for_path)
