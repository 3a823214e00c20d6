"""GPT-2 decoder-only LM in pure-functional JAX (ClipCap backbone).

The reference drives HF ``GPT2LMHeadModel`` with a hand-rolled, cache-less
greedy loop (reference: src/models/clipcap.py:344-471 — it re-runs the full
forward every step). This implementation is TPU-native: stacked layers under
``lax.scan``, an explicit KV cache for O(1) incremental decoding, fp32
attention softmax, learned positional embeddings, tied LM head.
Verified against HF torch in tests/test_gpt2_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    layer_norm_epsilon: float = 1e-5
    eos_token_id: int = 50256
    dtype: Any = jnp.bfloat16
    # whole GPT-2 block (LN1 + fused-QKV + causal attention + out-proj +
    # LN2 + MLP + residuals) as one Pallas program per image group
    # (ops/fused_attention_block.py::fused_gpt2_block). Applies to the
    # full-sequence forward (training / teacher forcing) when the
    # sequence is short enough for whole-group scores in VMEM (L <= 128);
    # prefill/decode keep the XLA KV-cache path. Differentiable via a
    # recompute VJP, so ClipCap mapper training may enable it.
    fused_block: bool = False

    @classmethod
    def gpt2_small(cls, **kw) -> "GPT2Config":
        return cls(**kw)

    @classmethod
    def small_test(cls, **kw) -> "GPT2Config":
        cfg = dict(
            vocab_size=128, n_positions=64, d_model=32, num_layers=2,
            num_heads=4, dtype=jnp.float32,
        )
        cfg.update(kw)
        return cls(**cfg)


def init_gpt2_params(
    key: jax.Array, cfg: GPT2Config, param_dtype: Any = jnp.bfloat16
) -> Params:
    d, n = cfg.d_model, cfg.num_layers
    keys = iter(jax.random.split(key, 16))

    def normal(shape, std=0.02):
        return (jax.random.normal(next(keys), shape) * std).astype(param_dtype)

    return {
        "wte": normal((cfg.vocab_size, d)),
        "wpe": normal((cfg.n_positions, d), 0.01),
        "blocks": {
            "ln1_scale": jnp.ones((n, d), param_dtype),
            "ln1_bias": jnp.zeros((n, d), param_dtype),
            "attn_qkv": normal((n, d, 3 * d)),
            "attn_qkv_bias": jnp.zeros((n, 3 * d), param_dtype),
            "attn_out": normal((n, d, d)),
            "attn_out_bias": jnp.zeros((n, d), param_dtype),
            "ln2_scale": jnp.ones((n, d), param_dtype),
            "ln2_bias": jnp.zeros((n, d), param_dtype),
            "mlp_fc": normal((n, d, 4 * d)),
            "mlp_fc_bias": jnp.zeros((n, 4 * d), param_dtype),
            "mlp_proj": normal((n, 4 * d, d)),
            "mlp_proj_bias": jnp.zeros((n, d), param_dtype),
        },
        "ln_f_scale": jnp.ones((d,), param_dtype),
        "ln_f_bias": jnp.zeros((d,), param_dtype),
    }


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


def _split_heads(x: jax.Array, heads: int) -> jax.Array:
    return x.reshape(x.shape[0], x.shape[1], heads, -1)


def _gpt2_block(
    layer_p: Params,
    x: jax.Array,                       # (B, Q, D)
    bias: jax.Array,                    # (B or 1, 1, Q, K) additive, f32
    cfg: GPT2Config,
    kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_index: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    h = cfg.num_heads
    dt = x.dtype
    ln1 = layer_norm(x, layer_p["ln1_scale"], layer_p["ln1_bias"],
                     cfg.layer_norm_epsilon)
    qkv = jnp.einsum("bqd,de->bqe", ln1, layer_p["attn_qkv"].astype(dt),
                     preferred_element_type=jnp.float32).astype(dt)
    qkv = qkv + layer_p["attn_qkv_bias"].astype(dt)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(a, h) for a in (q, k, v))

    if kv_cache is not None:
        k_buf, v_buf = kv_cache
        k_buf = jax.lax.dynamic_update_slice(
            k_buf, k.astype(k_buf.dtype), (0, cache_index, 0, 0)
        )
        v_buf = jax.lax.dynamic_update_slice(
            v_buf, v.astype(v_buf.dtype), (0, cache_index, 0, 0)
        )
        k, v = k_buf, v_buf
        new_cache = (k_buf, v_buf)
    else:
        new_cache = None

    scale = (cfg.d_model // h) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1).astype(dt)
    attn = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                      preferred_element_type=jnp.float32).astype(dt)
    attn = attn.reshape(attn.shape[0], attn.shape[1], -1)
    attn = jnp.einsum("bqe,ed->bqd", attn, layer_p["attn_out"].astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)
    x = x + attn + layer_p["attn_out_bias"].astype(dt)

    ln2 = layer_norm(x, layer_p["ln2_scale"], layer_p["ln2_bias"],
                     cfg.layer_norm_epsilon)
    hidden = jnp.einsum("bqd,df->bqf", ln2, layer_p["mlp_fc"].astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
    hidden = jax.nn.gelu(hidden + layer_p["mlp_fc_bias"].astype(dt),
                         approximate=True)
    hidden = jnp.einsum("bqf,fd->bqd", hidden, layer_p["mlp_proj"].astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
    x = x + hidden + layer_p["mlp_proj_bias"].astype(dt)
    return x, new_cache


def gpt2_embed(params: Params, cfg: GPT2Config, input_ids: jax.Array,
               position_offset: int | jax.Array = 0) -> jax.Array:
    positions = jnp.arange(input_ids.shape[1]) + position_offset
    return (
        params["wte"].astype(cfg.dtype)[input_ids]
        + params["wpe"].astype(cfg.dtype)[positions][None]
    )


def gpt2_forward(
    params: Params,
    cfg: GPT2Config,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-sequence forward; returns fp32 logits (B, L, V).

    ``inputs_embeds`` entries must already include positional embeddings —
    use gpt2_embed / embed_with_prefix."""
    if inputs_embeds is None:
        inputs_embeds = gpt2_embed(params, cfg, input_ids)
    x = inputs_embeds.astype(cfg.dtype)
    batch, length, _ = x.shape

    if cfg.fused_block and length <= 128:
        from ..ops.fused_attention_block import fused_gpt2_block_vjp

        mask = (jnp.ones((batch, length), jnp.int32)
                if attention_mask is None
                else attention_mask.astype(jnp.int32))

        def layer(carry, layer_p):
            y = fused_gpt2_block_vjp(
                carry, mask,
                layer_p["ln1_scale"], layer_p["ln1_bias"],
                layer_p["attn_qkv"], layer_p["attn_qkv_bias"],
                layer_p["attn_out"], layer_p["attn_out_bias"],
                layer_p["ln2_scale"], layer_p["ln2_bias"],
                layer_p["mlp_fc"], layer_p["mlp_fc_bias"],
                layer_p["mlp_proj"], layer_p["mlp_proj_bias"],
                cfg.num_heads, cfg.layer_norm_epsilon,
            )
            return y, None

        x, _ = jax.lax.scan(layer, x, params["blocks"])
        x = layer_norm(x, params["ln_f_scale"], params["ln_f_bias"],
                       cfg.layer_norm_epsilon)
        return jnp.einsum("bld,vd->blv", x, params["wte"].astype(x.dtype),
                          preferred_element_type=jnp.float32)

    causal = jnp.tril(jnp.ones((length, length), dtype=bool))
    bias = jnp.where(causal[None, None], 0.0, NEG_INF)
    if attention_mask is not None:
        bias = bias + jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, NEG_INF
        )

    def layer(carry, layer_p):
        y, _ = _gpt2_block(layer_p, carry, bias, cfg)
        return y, None

    x, _ = jax.lax.scan(layer, x, params["blocks"])
    x = layer_norm(x, params["ln_f_scale"], params["ln_f_bias"],
                   cfg.layer_norm_epsilon)
    return jnp.einsum("bld,vd->blv", x, params["wte"].astype(x.dtype),
                      preferred_element_type=jnp.float32)


def init_gpt2_cache(cfg: GPT2Config, batch: int, max_len: int) -> Params:
    h, kv = cfg.num_heads, cfg.d_model // cfg.num_heads
    n = cfg.num_layers
    return {
        "k": jnp.zeros((n, batch, max_len, h, kv), dtype=cfg.dtype),
        "v": jnp.zeros((n, batch, max_len, h, kv), dtype=cfg.dtype),
        "index": jnp.zeros((), dtype=jnp.int32),
    }


def gpt2_prefill(
    params: Params,
    cfg: GPT2Config,
    inputs_embeds: jax.Array,       # (B, L, D) incl. positional embeddings
    attention_mask: jax.Array,      # (B, L)
    cache: Params,
) -> Tuple[jax.Array, Params]:
    """Run the prompt through the model, filling the cache from slot 0.
    Returns (fp32 logits of the LAST position (B, V), cache)."""
    x = inputs_embeds.astype(cfg.dtype)
    length = x.shape[1]
    max_len = cache["k"].shape[2]
    causal = jnp.tril(jnp.ones((length, length), dtype=bool))
    bias = jnp.where(causal[None, None], 0.0, NEG_INF)
    bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, NEG_INF)
    # queries attend only within the prompt during prefill
    pad = jnp.full((1, 1, length, max_len - length), NEG_INF)
    bias_full = jnp.concatenate(
        [jnp.broadcast_to(bias, (x.shape[0], 1, length, length)),
         jnp.broadcast_to(pad, (x.shape[0], 1, length, max_len - length))],
        axis=-1,
    )

    def layer(carry, scanned):
        layer_p, k_buf, v_buf = scanned
        y, (k_buf, v_buf) = _gpt2_block(
            layer_p, carry, bias_full, cfg,
            kv_cache=(k_buf, v_buf), cache_index=jnp.int32(0),
        )
        return y, (k_buf, v_buf)

    x, (new_k, new_v) = jax.lax.scan(
        layer, x, (params["blocks"], cache["k"], cache["v"])
    )
    x = layer_norm(x, params["ln_f_scale"], params["ln_f_bias"],
                   cfg.layer_norm_epsilon)
    logits = jnp.einsum("bld,vd->blv", x, params["wte"].astype(x.dtype),
                        preferred_element_type=jnp.float32)
    new_cache = dict(cache, k=new_k, v=new_v,
                     index=jnp.asarray(length, jnp.int32))
    return logits[:, -1], new_cache


def gpt2_decode_step(
    params: Params,
    cfg: GPT2Config,
    token: jax.Array,            # (B,)
    cache: Params,
    attention_mask: jax.Array,   # (B, max_len) — 1 for valid cache slots
) -> Tuple[jax.Array, Params]:
    """One incremental step; returns (fp32 logits (B, V), new cache)."""
    index = cache["index"]
    x = gpt2_embed(params, cfg, token[:, None], position_offset=index)
    max_len = cache["k"].shape[2]
    pos_valid = jnp.arange(max_len) <= index
    bias = jnp.where(
        (attention_mask > 0) & pos_valid[None, :], 0.0, NEG_INF
    )[:, None, None, :].astype(jnp.float32)

    def layer(carry, scanned):
        layer_p, k_buf, v_buf = scanned
        y, (k_buf, v_buf) = _gpt2_block(
            layer_p, carry, bias, cfg, kv_cache=(k_buf, v_buf),
            cache_index=index,
        )
        return y, (k_buf, v_buf)

    x, (new_k, new_v) = jax.lax.scan(
        layer, x, (params["blocks"], cache["k"], cache["v"])
    )
    x = layer_norm(x, params["ln_f_scale"], params["ln_f_bias"],
                   cfg.layer_norm_epsilon)
    logits = jnp.einsum("bld,vd->blv", x, params["wte"].astype(x.dtype),
                        preferred_element_type=jnp.float32)[:, 0]
    return logits, dict(cache, k=new_k, v=new_v, index=index + 1)
