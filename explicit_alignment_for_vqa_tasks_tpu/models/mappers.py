"""Mapping networks: CLIP embedding -> visual prefix in LM embedding space.

These are the ONLY trainable parameters in the framework (the LM is
frozen). Three families, mirroring the reference's capability set
(reference: src/models/vct0.py:58-69 MLP, :240-264 TransformerMapper,
:42-55 + flamingo-pytorch PerceiverResampler):

  * MLP:          prefix_size -> (d*n)/2 -> d*n, tanh
  * Transformer:  linear to clip_length tokens + learned prefix constants,
                  pre-LN self-attention stack (relu MLP, ratio 2)
  * Perceiver:    learned latents cross-attend to input features
                  (flamingo-style resampler, depth 2)

All are pure functions over explicit param pytrees; trained in fp32
(they're tiny — optimizer stability beats memory here), cast to the
compute dtype at the LM boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bound = (1.0 / in_dim) ** 0.5
    return {
        "w": jax.random.uniform(
            k1, (in_dim, out_dim), minval=-bound, maxval=bound, dtype=dtype
        ),
        "b": jax.random.uniform(
            k2, (out_dim,), minval=-bound, maxval=bound, dtype=dtype
        ),
    }


def _linear(p: Params, x: jax.Array) -> jax.Array:
    return jnp.einsum("...d,de->...e", x, p["w"].astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype) \
        + p["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# MLP mapper
# ---------------------------------------------------------------------------

def init_mlp_mapper(
    key: jax.Array, prefix_size: int, d_model: int, prefix_length: int
) -> Params:
    hidden = (d_model * prefix_length) // 2
    out = d_model * prefix_length
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _linear_init(k1, prefix_size, hidden),
        "fc2": _linear_init(k2, hidden, out),
    }


def mlp_mapper_apply(params: Params, x: jax.Array) -> jax.Array:
    """(..., prefix_size) -> (..., prefix_length * d_model)."""
    return _linear(params["fc2"], jnp.tanh(_linear(params["fc1"], x)))


# ---------------------------------------------------------------------------
# Transformer mapper
# ---------------------------------------------------------------------------

def init_transformer_mapper(
    key: jax.Array,
    prefix_size: int,
    d_model: int,
    prefix_length: int,
    clip_length: int,
    num_layers: int = 8,
    num_heads: int = 8,
) -> Params:
    keys = jax.random.split(key, 4 + num_layers)
    blocks = []
    for i in range(num_layers):
        bk = jax.random.split(keys[4 + i], 4)
        blocks.append({
            "ln1_scale": jnp.ones((d_model,)),
            "ln1_bias": jnp.zeros((d_model,)),
            "q": _linear_init(bk[0], d_model, d_model),
            "kv": _linear_init(bk[1], d_model, 2 * d_model),
            "o": _linear_init(bk[2], d_model, d_model),
            "ln2_scale": jnp.ones((d_model,)),
            "ln2_bias": jnp.zeros((d_model,)),
            "mlp": {
                "fc1": _linear_init(
                    jax.random.fold_in(bk[3], 0), d_model, 2 * d_model
                ),
                "fc2": _linear_init(
                    jax.random.fold_in(bk[3], 1), 2 * d_model, d_model
                ),
            },
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "linear": _linear_init(keys[0], prefix_size, clip_length * d_model),
        "prefix_const": jax.random.normal(keys[1], (prefix_length, d_model)),
        "blocks": stacked,
    }


def _ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _mapper_attention(layer_p: Params, x: jax.Array, heads: int) -> jax.Array:
    d = x.shape[-1]
    head_dim = d // heads
    q = _linear(layer_p["q"], x).reshape(*x.shape[:-1], heads, head_dim)
    kv = _linear(layer_p["kv"], x).reshape(*x.shape[:-1], 2, heads, head_dim)
    k, v = kv[..., 0, :, :], kv[..., 1, :, :]
    logits = jnp.einsum("bnhd,bmhd->bnmh", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (head_dim ** -0.5)
    weights = jax.nn.softmax(logits, axis=2).astype(x.dtype)
    out = jnp.einsum("bnmh,bmhd->bnhd", weights, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _linear(layer_p["o"], out.reshape(*x.shape[:-1], d))


def transformer_mapper_apply(cfg: "MapperConfig", params: Params,
                             x: jax.Array) -> jax.Array:
    """(..., prefix_size) -> (..., prefix_length * d_model).

    Projects to clip_length token slots, appends learned prefix constants,
    runs the transformer, returns the transformed constants
    (reference: vct0.py:241-248)."""
    clip_length = cfg.clip_length
    prefix_length = cfg.prefix_length
    heads = cfg.num_heads
    lead = x.shape[:-1]
    d_model = params["prefix_const"].shape[-1]

    tokens = _linear(params["linear"], x).reshape(-1, clip_length, d_model)
    batch = tokens.shape[0]
    const = jnp.broadcast_to(
        params["prefix_const"].astype(x.dtype)[None],
        (batch, prefix_length, d_model),
    )
    seq = jnp.concatenate([tokens, const], axis=1)

    def layer(carry, layer_p):
        y = carry
        y = y + _mapper_attention(
            layer_p, _ln(y, layer_p["ln1_scale"], layer_p["ln1_bias"]), heads
        )
        h = _ln(y, layer_p["ln2_scale"], layer_p["ln2_bias"])
        h = _linear(layer_p["mlp"]["fc2"],
                    jax.nn.relu(_linear(layer_p["mlp"]["fc1"], h)))
        return y + h, None

    seq, _ = jax.lax.scan(layer, seq, params["blocks"])
    out = seq[:, clip_length:]
    return out.reshape(*lead, prefix_length * d_model)


# ---------------------------------------------------------------------------
# Perceiver resampler
# ---------------------------------------------------------------------------

def init_perceiver_mapper(
    key: jax.Array,
    prefix_size: int,
    d_model: int,
    prefix_length: int,
    depth: int = 2,
    heads: int = 8,
    dim_head: int = 64,
    ff_mult: int = 1,
    latents_init: jax.Array = None,
) -> Params:
    keys = jax.random.split(key, 3 + depth)
    inner = heads * dim_head
    if latents_init is None:
        latents_init = jax.random.normal(keys[1], (prefix_length, d_model))
    blocks = []
    for i in range(depth):
        bk = jax.random.split(keys[3 + i], 5)
        blocks.append({
            "ln_latents_scale": jnp.ones((d_model,)),
            "ln_latents_bias": jnp.zeros((d_model,)),
            "ln_input_scale": jnp.ones((d_model,)),
            "ln_input_bias": jnp.zeros((d_model,)),
            "q": _linear_init(bk[0], d_model, inner),
            "kv": _linear_init(bk[1], d_model, 2 * inner),
            "o": _linear_init(bk[2], inner, d_model),
            "ln_ff_scale": jnp.ones((d_model,)),
            "ln_ff_bias": jnp.zeros((d_model,)),
            "ff1": _linear_init(bk[3], d_model, ff_mult * d_model),
            "ff2": _linear_init(bk[4], ff_mult * d_model, d_model),
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "input_proj": _linear_init(keys[0], prefix_size, d_model),
        "latents": latents_init,
        "final_ln_scale": jnp.ones((d_model,)),
        "final_ln_bias": jnp.zeros((d_model,)),
        "blocks": stacked,
    }


def perceiver_mapper_apply(cfg: "MapperConfig", params: Params,
                           x: jax.Array) -> jax.Array:
    """(..., prefix_size) -> (..., prefix_length * d_model).

    Latents cross-attend to the (projected) input features; keys/values
    see [features; latents] like the flamingo resampler."""
    heads, dim_head = cfg.num_heads, cfg.dim_head
    d_model = params["latents"].shape[-1]
    n_latents = cfg.prefix_length
    lead = x.shape[:-1]

    feats = _linear(params["input_proj"], x).reshape(-1, 1, d_model)
    batch = feats.shape[0]
    latents = jnp.broadcast_to(
        params["latents"].astype(x.dtype)[None], (batch, n_latents, d_model)
    )

    def layer(carry, layer_p):
        lat = carry
        lat_n = _ln(lat, layer_p["ln_latents_scale"],
                    layer_p["ln_latents_bias"])
        feats_n = _ln(feats, layer_p["ln_input_scale"],
                      layer_p["ln_input_bias"])
        kv_input = jnp.concatenate([feats_n, lat_n], axis=1)
        q = _linear(layer_p["q"], lat_n).reshape(
            batch, n_latents, heads, dim_head
        )
        kv = _linear(layer_p["kv"], kv_input).reshape(
            batch, -1, 2, heads, dim_head
        )
        k, v = kv[:, :, 0], kv[:, :, 1]
        logits = jnp.einsum("bnhd,bmhd->bnmh", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (dim_head ** -0.5)
        weights = jax.nn.softmax(logits, axis=2).astype(x.dtype)
        out = jnp.einsum("bnmh,bmhd->bnhd", weights, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        lat = lat + _linear(
            layer_p["o"], out.reshape(batch, n_latents, heads * dim_head)
        )
        h = _ln(lat, layer_p["ln_ff_scale"], layer_p["ln_ff_bias"])
        lat = lat + _linear(layer_p["ff2"],
                            jax.nn.gelu(_linear(layer_p["ff1"], h)))
        return lat, None

    latents, _ = jax.lax.scan(layer, latents, params["blocks"])
    latents = _ln(latents, params["final_ln_scale"], params["final_ln_bias"])
    return latents.reshape(*lead, n_latents * d_model)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MapperConfig:
    """Static mapper hyperparameters (kept OUT of the param pytree so the
    pytree stays pure arrays for jit/optax)."""

    mapping_type: str = "mlp"          # "mlp" | "transformer" | "perceiver"
    prefix_size: int = 768             # CLIP embedding dim
    d_model: int = 2048                # LM embedding dim
    prefix_length: int = 10
    clip_length: int = 10
    num_layers: int = 8
    num_heads: int = 8
    dim_head: int = 64


def init_mapper(
    key: jax.Array,
    cfg: MapperConfig,
    latents_init: jax.Array = None,
) -> Params:
    if cfg.mapping_type == "transformer":
        return init_transformer_mapper(
            key, cfg.prefix_size, cfg.d_model, cfg.prefix_length,
            cfg.clip_length, cfg.num_layers, cfg.num_heads,
        )
    if cfg.mapping_type == "perceiver":
        return init_perceiver_mapper(
            key, cfg.prefix_size, cfg.d_model, cfg.prefix_length,
            heads=cfg.num_heads, dim_head=cfg.dim_head,
            latents_init=latents_init,
        )
    # reference falls back to MLP for unknown types (vct0.py:375-383)
    return init_mlp_mapper(key, cfg.prefix_size, cfg.d_model,
                           cfg.prefix_length)


def mapper_apply(cfg: MapperConfig, params: Params, x: jax.Array) -> jax.Array:
    """(..., prefix_size) -> (..., prefix_length * d_model)."""
    if cfg.mapping_type == "transformer":
        return transformer_mapper_apply(cfg, params, x)
    if cfg.mapping_type == "perceiver":
        return perceiver_mapper_apply(cfg, params, x)
    return mlp_mapper_apply(params, x)
