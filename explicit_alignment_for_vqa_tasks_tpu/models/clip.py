"""CLIP ViT image/text encoders in pure-functional JAX.

The reference calls OpenAI ``clip`` (torch/CUDA) one image at a time for
feature extraction (reference: src/tools/
extract_contrastive_image_embeddings.py:58-65). This is the TPU-native
replacement and the headline-benchmark surface (>=5k ViT-L/14@336
encodings/sec/chip):

  * NHWC image layout; patch embedding as an explicit patch-reshape +
    one big matmul (the conv→matmul fusion the MXU wants);
  * stacked layers under ``lax.scan``; fp32 softmax/LN, bf16 matmuls;
  * quick-GELU (OpenAI CLIP's activation);
  * text tower with causal mask and EOT-token pooling.

Numerics verified against HF CLIP in tests/test_clip_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    width: int = 1024           # hidden size
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    projection_dim: int = 768
    layer_norm_epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    # fp32 attention logits by default (HF parity); bf16 buys ~11% extra
    # throughput at 224px/50-token shapes where score-tensor HBM traffic
    # and tiny-matmul overhead dominate — appropriate for bulk feature
    # extraction (fp16-class inference is standard for CLIP).
    fast_attention: bool = False
    # Fused Pallas attention block (ops/fused_attention_block.py):
    # qkv-proj + attention + out-proj in one kernel, q/k/v and scores never
    # touch HBM. Measured +30% on ViT-B/32 (8.6k -> 11.2k img/s on v5e,
    # cosine 0.99996 vs the XLA path). Applies when sequences are short
    # enough for whole-sequence scores in VMEM (seq <= 128) and the batch
    # divides the kernel group size; falls back to the XLA path otherwise.
    fused_attention: bool = False
    # Whole encoder block (LN1 + attention + LN2 + MLP + residuals) as ONE
    # Pallas program (ops/fused_attention_block.py::fused_vit_block):
    # bf16-operand matmuls with fp32 accumulation; the residual stream,
    # scores, and gelu hidden never touch HBM. Supersedes fused_attention
    # for short sequences (seq <= 128); falls back to fused_attention /
    # XLA otherwise.
    fused_block: bool = False
    fused_block_group: int = 0   # images per program; 0 = auto
    # long-sequence (seq > 128) fused_block strategy (ViT-L/14@336).
    # All variants were measured head-to-head on the chip
    # (tools/vit_l_study.py, results in PARITY.md "ViT-L/14@336
    # accounting (round 3)"):
    #   "" / "split3" — the DEFAULT and measured best (385.6 img/s):
    #                   three programs — fused LN+QKV, attention core +
    #                   out-proj + residual, fused MLP (x round-trips
    #                   HBM between programs but never the LN/score/gelu
    #                   intermediates)
    #   "split"       — round-2 split path: XLA LN/QKV/o-proj +
    #                   attention_core + fused_mlp_block (371.4 img/s)
    #   "whole"       — the entire block as ONE program (weights +
    #                   activations ~57 MB VMEM; needs
    #                   ensure_scoped_vmem_limit(98304); 348.5 img/s —
    #                   VMEM pressure serializes the scheduler)
    #   "whole_dd"    — "whole" with deferred softmax division (357.0)
    #   "split_c2"    — "split" with the MLP kernel row-chunked in 2
    #                   (measured NEUTRAL: 372.5 — Mosaic already
    #                   overlaps the VPU chain with the matmuls)
    #   "split_fe"    — "split" with bf16-exp attention core (~1/256
    #                   relative error on attention probabilities;
    #                   measured NEUTRAL: 370.4 — exp is not the
    #                   core's bottleneck, the half-rate head_dim-64
    #                   MXU contractions are)
    #   "split_c2fe"  — both of the above (371.6)
    # SHORT-sequence (seq <= 128, ViT-B/32) overrides, all measured
    # SLOWER than the default whole-block G=4 kernel in the round-4
    # shootout (tools/vit_b_study.py, PARITY.md "ViT-B/32 accounting"):
    #   "split3"      — the three-program recipe at short seq, grouped
    #                   like the whole-block kernel (13.2k vs 14.9k
    #                   img/s — the extra x/qkv HBM round-trips lose
    #                   when the whole block fits VMEM)
    #   "whole_fe"    — whole-block kernel with bf16-exp + deferred-
    #                   division softmax (14.7k — the head-loop
    #                   serialization, not exp width, is the cost)
    fused_block_long: str = ""
    # int8 whole-block kernel (ops/fused_attention_block.fused_vit_block_q8):
    # the six projection matmuls run int8 on the MXU (~1.9x the bf16
    # rate on v5e); per-row dynamic activation quant, per-channel weight
    # quant (params must carry "blocks_q8" from quantize_vision_blocks).
    # OPT-IN for bulk feature extraction — int8-level embedding drift
    # (cosine vs bf16 pinned in tests) is not bit-parity with the
    # reference's fp16 CLIP.
    int8: bool = False

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1

    @classmethod
    def vit_l_14_336(cls, **kw) -> "CLIPVisionConfig":
        return cls(**kw)

    @classmethod
    def vit_b_32(cls, **kw) -> "CLIPVisionConfig":
        cfg = dict(image_size=224, patch_size=32, width=768, num_layers=12,
                   num_heads=12, projection_dim=512)
        cfg.update(kw)
        return cls(**cfg)

    @classmethod
    def small_test(cls, **kw) -> "CLIPVisionConfig":
        cfg = dict(image_size=28, patch_size=14, width=32, num_layers=2,
                   num_heads=4, projection_dim=16, dtype=jnp.float32)
        cfg.update(kw)
        return cls(**cfg)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    num_layers: int = 12
    num_heads: int = 12
    projection_dim: int = 768
    layer_norm_epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16

    @classmethod
    def small_test(cls, **kw) -> "CLIPTextConfig":
        cfg = dict(vocab_size=96, context_length=16, width=32, num_layers=2,
                   num_heads=4, projection_dim=16, dtype=jnp.float32)
        cfg.update(kw)
        return cls(**cfg)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _layer_norm(x, scale, bias, eps):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


def _fused_group(batch: int) -> int:
    # block-diag kernel: G=4 measured fastest on v5e (12.2k vs 12.0k
    # img/s at G=16 non-block-diag; G=8's extra masked score FLOPs lose)
    for g in (4, 2, 1):
        if batch % g == 0:
            return g
    return 1


def _encoder_block(layer_p, x, bias, num_heads, eps, use_pallas=False,
                   fast_attention=False, fused_attention=False,
                   fused_block=False, fused_block_group=0,
                   fused_block_long=""):
    dt = x.dtype
    head_dim = x.shape[-1] // num_heads

    if fused_block and bias is None and x.shape[1] > 128 and \
            fused_block_long in ("whole", "whole_dd"):
        # whole block in ONE program at long seq (group=1): ~57 MB VMEM
        # peak — callers must raise the scoped budget to 96 MB
        from ..ops.fused_attention_block import fused_vit_block

        return fused_vit_block(
            x, layer_p["ln1_scale"], layer_p["ln1_bias"],
            layer_p["q"], layer_p["q_bias"],
            layer_p["k"], layer_p["k_bias"],
            layer_p["v"], layer_p["v_bias"],
            layer_p["o"], layer_p["o_bias"],
            layer_p["ln2_scale"], layer_p["ln2_bias"],
            layer_p["mlp_fc"], layer_p["mlp_fc_bias"],
            layer_p["mlp_proj"], layer_p["mlp_proj_bias"],
            num_heads=num_heads, group=1, eps=eps,
            deferred_div=(fused_block_long == "whole_dd"),
        )

    if fused_block and bias is None and (
        (x.shape[1] > 128 and fused_block_long in ("", "split3"))
        or (x.shape[1] <= 128 and fused_block_long == "split3")
    ):
        # three fused programs; only the residual stream and q/k/v
        # round-trip HBM between them. Default at long seq (the measured
        # ViT-L best); opt-in at short seq via fused_block_long="split3"
        # (the vit_b_study shootout surface) where the per-program group
        # defaults to the same auto size as the whole-block kernel.
        from ..ops.fused_attention_block import (
            attention_core_oproj,
            fused_ln_qkv,
            fused_mlp_block,
        )

        grp = 1 if x.shape[1] > 128 else (
            fused_block_group or _fused_group(x.shape[0])
        )
        q, k, v = fused_ln_qkv(
            x, layer_p["ln1_scale"], layer_p["ln1_bias"],
            layer_p["q"], layer_p["q_bias"],
            layer_p["k"], layer_p["k_bias"],
            layer_p["v"], layer_p["v_bias"],
            scale=head_dim ** -0.5, group=grp, eps=eps,
        )
        y = attention_core_oproj(
            x, q, k, v, layer_p["o"], layer_p["o_bias"],
            num_heads=num_heads, group=grp,
        )
        return fused_mlp_block(
            y, layer_p["ln2_scale"], layer_p["ln2_bias"],
            layer_p["mlp_fc"], layer_p["mlp_fc_bias"],
            layer_p["mlp_proj"], layer_p["mlp_proj_bias"],
            group=grp, eps=eps,
        )

    if fused_block and bias is None and x.shape[1] > 128:
        # long sequences: scores for a whole image group don't fit VMEM
        # alongside the block weights, so split into the fused attention
        # core (projections in XLA) + the fused MLP program. The MLP
        # kernel needs a raised scoped-VMEM limit at production widths
        # (utils/tpu_flags.ensure_scoped_vmem_limit).
        # "split_c2"/"split_fe"/"split_c2fe" select the measured round-3
        # sub-variants: row-chunked MLP (VPU/MXU overlap) and/or bf16-exp
        # attention core.
        from ..ops.fused_attention_block import attention_core, fused_mlp_block

        mlp_chunks = 2 if fused_block_long in ("split_c2", "split_c2fe") \
            else 1
        fast_exp = fused_block_long in ("split_fe", "split_c2fe")
        ln1 = _layer_norm(x, layer_p["ln1_scale"], layer_p["ln1_bias"], eps)
        q = jnp.einsum("bld,de->ble", ln1, layer_p["q"].astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        q = q + layer_p["q_bias"].astype(dt)
        k = jnp.einsum("bld,de->ble", ln1, layer_p["k"].astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        k = k + layer_p["k_bias"].astype(dt)
        v = jnp.einsum("bld,de->ble", ln1, layer_p["v"].astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        v = v + layer_p["v_bias"].astype(dt)
        attn = attention_core(q * (head_dim ** -0.5), k, v, num_heads,
                              group=1, fast_exp=fast_exp)
        attn = jnp.einsum("ble,ed->bld", attn, layer_p["o"].astype(dt),
                          preferred_element_type=jnp.float32).astype(dt)
        x = x + attn + layer_p["o_bias"].astype(dt)
        return fused_mlp_block(
            x, layer_p["ln2_scale"], layer_p["ln2_bias"],
            layer_p["mlp_fc"], layer_p["mlp_fc_bias"],
            layer_p["mlp_proj"], layer_p["mlp_proj_bias"],
            group=1, eps=eps, chunks=mlp_chunks,
        )

    if fused_block and bias is None and x.shape[1] <= 128:
        from ..ops.fused_attention_block import fused_vit_block

        return fused_vit_block(
            x, layer_p["ln1_scale"], layer_p["ln1_bias"],
            layer_p["q"], layer_p["q_bias"],
            layer_p["k"], layer_p["k_bias"],
            layer_p["v"], layer_p["v_bias"],
            layer_p["o"], layer_p["o_bias"],
            layer_p["ln2_scale"], layer_p["ln2_bias"],
            layer_p["mlp_fc"], layer_p["mlp_fc_bias"],
            layer_p["mlp_proj"], layer_p["mlp_proj_bias"],
            num_heads=num_heads,
            group=fused_block_group or _fused_group(x.shape[0]),
            eps=eps,
            # bf16-exp + deferred-division softmax: the short-seq VPU
            # lever found by tools/vit_b_study.py (opt-in)
            fast_exp=(fused_block_long == "whole_fe"),
        )

    ln1 = _layer_norm(x, layer_p["ln1_scale"], layer_p["ln1_bias"], eps)

    if fused_attention and bias is None:
        if x.shape[1] <= 128:
            # whole block in one kernel (weights + activations fit VMEM)
            from ..ops.fused_attention_block import fused_attention_block

            attn = fused_attention_block(
                ln1,
                layer_p["q"].astype(dt), layer_p["q_bias"].astype(dt),
                layer_p["k"].astype(dt), layer_p["k_bias"].astype(dt),
                layer_p["v"].astype(dt), layer_p["v_bias"].astype(dt),
                layer_p["o"].astype(dt), layer_p["o_bias"].astype(dt),
                num_heads=num_heads, group=_fused_group(x.shape[0]),
                block_diag=True,
            )
            x = x + attn
        else:
            # long sequences: projections in XLA, attention core fused
            from ..ops.fused_attention_block import attention_core

            q = jnp.einsum("bld,de->ble", ln1, layer_p["q"].astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
            q = q + layer_p["q_bias"].astype(dt)
            k = jnp.einsum("bld,de->ble", ln1, layer_p["k"].astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
            k = k + layer_p["k_bias"].astype(dt)
            v = jnp.einsum("bld,de->ble", ln1, layer_p["v"].astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
            v = v + layer_p["v_bias"].astype(dt)
            attn = attention_core(
                q * (head_dim ** -0.5), k, v, num_heads, group=1
            )
            attn = jnp.einsum(
                "ble,ed->bld", attn, layer_p["o"].astype(dt),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            x = x + attn + layer_p["o_bias"].astype(dt)
        ln2 = _layer_norm(x, layer_p["ln2_scale"], layer_p["ln2_bias"], eps)
        hidden = jnp.einsum(
            "bld,df->blf", ln2, layer_p["mlp_fc"].astype(dt),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        hidden = quick_gelu(hidden + layer_p["mlp_fc_bias"].astype(dt))
        hidden = jnp.einsum(
            "blf,fd->bld", hidden, layer_p["mlp_proj"].astype(dt),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        return x + hidden + layer_p["mlp_proj_bias"].astype(dt)
    q = jnp.einsum("bld,de->ble", ln1, layer_p["q"].astype(dt),
                   preferred_element_type=jnp.float32).astype(dt)
    q = q + layer_p["q_bias"].astype(dt)
    k = jnp.einsum("bld,de->ble", ln1, layer_p["k"].astype(dt),
                   preferred_element_type=jnp.float32).astype(dt)
    k = k + layer_p["k_bias"].astype(dt)
    v = jnp.einsum("bld,de->ble", ln1, layer_p["v"].astype(dt),
                   preferred_element_type=jnp.float32).astype(dt)
    v = v + layer_p["v_bias"].astype(dt)
    B, L, _ = q.shape
    q = q.reshape(B, L, num_heads, head_dim)
    k = k.reshape(B, L, num_heads, head_dim)
    v = v.reshape(B, L, num_heads, head_dim)

    if use_pallas:
        from ..ops.attention import flash_attention

        attn = flash_attention(q * (head_dim ** -0.5), k, v, bias=bias)
    elif fast_attention and bias is None:
        # bf16 scores, max-subtracted exp in fp32, bf16 PV — avoids fp32
        # score-tensor HBM traffic (see config note)
        s = jnp.einsum("bqhd,bkhd->bhqk", q * (head_dim ** -0.5), k,
                       preferred_element_type=jnp.bfloat16)
        m = jnp.max(s, -1, keepdims=True)
        p = jnp.exp((s - m).astype(jnp.float32)).astype(dt)
        weights = p / jnp.sum(p, -1, keepdims=True)
        attn = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                          preferred_element_type=jnp.bfloat16).astype(dt)
    else:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (head_dim ** -0.5)
        if bias is not None:
            logits = logits + bias
        weights = jax.nn.softmax(logits, axis=-1).astype(dt)
        attn = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                          preferred_element_type=jnp.float32).astype(dt)
    attn = attn.reshape(B, L, -1)
    attn = jnp.einsum("ble,ed->bld", attn, layer_p["o"].astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)
    x = x + attn + layer_p["o_bias"].astype(dt)

    ln2 = _layer_norm(x, layer_p["ln2_scale"], layer_p["ln2_bias"], eps)
    hidden = jnp.einsum("bld,df->blf", ln2, layer_p["mlp_fc"].astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
    hidden = quick_gelu(hidden + layer_p["mlp_fc_bias"].astype(dt))
    hidden = jnp.einsum("blf,fd->bld", hidden, layer_p["mlp_proj"].astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
    x = x + hidden + layer_p["mlp_proj_bias"].astype(dt)
    return x


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def init_clip_vision_params(
    key: jax.Array, cfg: CLIPVisionConfig, param_dtype: Any = jnp.bfloat16
) -> Params:
    w, n = cfg.width, cfg.num_layers
    keys = iter(jax.random.split(key, 24))

    def normal(shape, std=0.02):
        return (jax.random.normal(next(keys), shape) * std).astype(param_dtype)

    return {
        "class_embedding": normal((w,)),
        "patch_embedding": normal(
            (cfg.patch_size, cfg.patch_size, 3, w), w ** -0.5
        ),
        "position_embedding": normal((cfg.seq_len, w)),
        "pre_ln_scale": jnp.ones((w,), param_dtype),
        "pre_ln_bias": jnp.zeros((w,), param_dtype),
        "blocks": {
            "ln1_scale": jnp.ones((n, w), param_dtype),
            "ln1_bias": jnp.zeros((n, w), param_dtype),
            "q": normal((n, w, w)), "q_bias": jnp.zeros((n, w), param_dtype),
            "k": normal((n, w, w)), "k_bias": jnp.zeros((n, w), param_dtype),
            "v": normal((n, w, w)), "v_bias": jnp.zeros((n, w), param_dtype),
            "o": normal((n, w, w)), "o_bias": jnp.zeros((n, w), param_dtype),
            "ln2_scale": jnp.ones((n, w), param_dtype),
            "ln2_bias": jnp.zeros((n, w), param_dtype),
            "mlp_fc": normal((n, w, cfg.mlp_ratio * w)),
            "mlp_fc_bias": jnp.zeros((n, cfg.mlp_ratio * w), param_dtype),
            "mlp_proj": normal((n, cfg.mlp_ratio * w, w)),
            "mlp_proj_bias": jnp.zeros((n, w), param_dtype),
        },
        "post_ln_scale": jnp.ones((w,), param_dtype),
        "post_ln_bias": jnp.zeros((w,), param_dtype),
        "projection": normal((w, cfg.projection_dim), w ** -0.5),
    }


def quantize_vision_blocks(params: Params) -> Params:
    """Host-side, once: per-output-channel int8 quantization of the six
    projection matrices of every encoder block. Returns the "blocks_q8"
    pytree consumed by ``clip_encode_image`` when ``cfg.int8``."""
    import numpy as np

    from ..ops.fused_attention_block import quantize_weight_i8

    blocks = params["blocks"]
    out: Params = {}
    # q/k/v fuse into one (d_in, 3*d_out) matrix so the whole-block
    # kernel quantizes their shared input once (per-output-channel
    # scales are column-independent, so quantize-then-concat is exact)
    qkv = np.concatenate(
        [np.asarray(blocks[n], np.float32) for n in ("q", "k", "v")],
        axis=-1,
    )  # (layers, d_in, 3*d_out)
    pairs = [quantize_weight_i8(qkv[i]) for i in range(qkv.shape[0])]
    out["qkv"] = jnp.asarray(np.stack([q for q, _ in pairs]))
    out["qkv_scale"] = jnp.asarray(np.stack([s for _, s in pairs]))
    for name in ("o", "mlp_fc", "mlp_proj"):
        w = np.asarray(blocks[name], np.float32)  # (layers, d_in, d_out)
        pairs = [quantize_weight_i8(w[i]) for i in range(w.shape[0])]
        out[name] = jnp.asarray(np.stack([q for q, _ in pairs]))
        out[name + "_scale"] = jnp.asarray(np.stack([s for _, s in pairs]))
    return out


def patch_embed(params: Params, cfg: CLIPVisionConfig,
                images: jax.Array) -> jax.Array:
    """(B, H, W, 3) NHWC -> (B, grid*grid, width) via reshape + matmul."""
    B = images.shape[0]
    g, p = cfg.grid, cfg.patch_size
    x = images.astype(cfg.dtype)
    x = x.reshape(B, g, p, g, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, p * p * 3)
    kernel = params["patch_embedding"].reshape(p * p * 3, cfg.width)
    return jnp.einsum("bpk,kw->bpw", x, kernel.astype(cfg.dtype),
                      preferred_element_type=jnp.float32).astype(cfg.dtype)


def clip_encode_image(
    params: Params,
    cfg: CLIPVisionConfig,
    images: jax.Array,           # (B, H, W, 3) normalized NHWC
    project: bool = True,
    use_pallas: bool = False,
) -> jax.Array:
    """Returns (B, projection_dim) image embeddings (CLS pooled).

    Matches HF CLIPVisionModelWithProjection: embeddings -> pre-LN ->
    transformer -> post-LN on CLS -> linear projection."""
    x = patch_embed(params, cfg, images)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(cfg.dtype)[None, None],
        (x.shape[0], 1, cfg.width),
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(cfg.dtype)[None]
    x = _layer_norm(x, params["pre_ln_scale"], params["pre_ln_bias"],
                    cfg.layer_norm_epsilon)

    int8_active = cfg.int8 and "blocks_q8" in params
    if int8_active and x.shape[1] <= 128:
        from ..ops.fused_attention_block import fused_vit_block_q8

        def layer(carry, lp):
            return fused_vit_block_q8(
                carry, lp["ln1_scale"], lp["ln1_bias"],
                lp["qkv8"], lp["qkv8_scale"], lp["qkv_bias"],
                lp["o8"], lp["o8_scale"], lp["o_bias"],
                lp["ln2_scale"], lp["ln2_bias"],
                lp["fc8"], lp["fc8_scale"], lp["mlp_fc_bias"],
                lp["pr8"], lp["pr8_scale"], lp["mlp_proj_bias"],
                num_heads=cfg.num_heads,
                group=cfg.fused_block_group or _fused_group(x.shape[0]),
                eps=cfg.layer_norm_epsilon,
            ), None

        blocks = params["blocks"]
        q8 = params["blocks_q8"]
        stacked = {
            k: blocks[k]
            for k in ("ln1_scale", "ln1_bias", "ln2_scale", "ln2_bias",
                      "o_bias", "mlp_fc_bias", "mlp_proj_bias")
        }
        stacked.update({
            "qkv8": q8["qkv"], "qkv8_scale": q8["qkv_scale"],
            "qkv_bias": jnp.concatenate(
                [blocks["q_bias"], blocks["k_bias"], blocks["v_bias"]],
                axis=-1),
            "o8": q8["o"], "o8_scale": q8["o_scale"],
            "fc8": q8["mlp_fc"], "fc8_scale": q8["mlp_fc_scale"],
            "pr8": q8["mlp_proj"], "pr8_scale": q8["mlp_proj_scale"],
        })
        x, _ = jax.lax.scan(layer, x, stacked)

    elif int8_active:
        # long sequences: bf16 projections + fused attention core (as in
        # the fused_block path) but the MLP runs the int8 kernel — the
        # XLA int8 MLP is neutral (quant passes round-trip HBM), the
        # fused one keeps them in VMEM
        from ..ops.fused_attention_block import (
            attention_core,
            fused_mlp_block_q8,
            fused_qkv_q8,
        )

        dt = cfg.dtype
        head_dim = cfg.width // cfg.num_heads
        q8 = params["blocks_q8"]

        def layer(carry, lp):
            q, k, v = fused_qkv_q8(
                carry, lp["ln1_scale"], lp["ln1_bias"],
                lp["qkv8"], lp["qkv8_scale"], lp["qkv_bias"],
                scale=head_dim ** -0.5, group=1,
                eps=cfg.layer_norm_epsilon,
            )
            attn = attention_core(q, k, v, cfg.num_heads, group=1)
            attn = jnp.einsum("ble,ed->bld", attn, lp["o"].astype(dt),
                              preferred_element_type=jnp.float32).astype(dt)
            y = carry + attn + lp["o_bias"].astype(dt)
            return fused_mlp_block_q8(
                y, lp["ln2_scale"], lp["ln2_bias"],
                lp["fc8"], lp["fc8_scale"], lp["mlp_fc_bias"],
                lp["pr8"], lp["pr8_scale"], lp["mlp_proj_bias"],
                group=1, eps=cfg.layer_norm_epsilon,
            ), None

        blocks = params["blocks"]
        stacked = {
            k: blocks[k]
            for k in ("ln1_scale", "ln1_bias", "ln2_scale", "ln2_bias",
                      "o", "o_bias", "mlp_fc_bias", "mlp_proj_bias")
        }
        stacked.update({
            "qkv8": q8["qkv"], "qkv8_scale": q8["qkv_scale"],
            "qkv_bias": jnp.concatenate(
                [blocks["q_bias"], blocks["k_bias"], blocks["v_bias"]],
                axis=-1),
            "fc8": q8["mlp_fc"], "fc8_scale": q8["mlp_fc_scale"],
            "pr8": q8["mlp_proj"], "pr8_scale": q8["mlp_proj_scale"],
        })
        x, _ = jax.lax.scan(layer, x, stacked)

    else:
        def layer(carry, layer_p):
            return _encoder_block(
                layer_p, carry, None, cfg.num_heads, cfg.layer_norm_epsilon,
                use_pallas=use_pallas, fast_attention=cfg.fast_attention,
                fused_attention=cfg.fused_attention,
                fused_block=cfg.fused_block,
                fused_block_group=cfg.fused_block_group,
                fused_block_long=cfg.fused_block_long,
            ), None

        x, _ = jax.lax.scan(layer, x, params["blocks"])

    pooled = _layer_norm(
        x[:, 0], params["post_ln_scale"], params["post_ln_bias"],
        cfg.layer_norm_epsilon,
    )
    if project and "projection" in params:
        pooled = jnp.einsum(
            "bd,dp->bp", pooled, params["projection"].astype(pooled.dtype),
            preferred_element_type=jnp.float32,
        ).astype(pooled.dtype)
    return pooled


# ---------------------------------------------------------------------------
# Text tower
# ---------------------------------------------------------------------------

def init_clip_text_params(
    key: jax.Array, cfg: CLIPTextConfig, param_dtype: Any = jnp.bfloat16
) -> Params:
    w, n = cfg.width, cfg.num_layers
    keys = iter(jax.random.split(key, 24))

    def normal(shape, std=0.02):
        return (jax.random.normal(next(keys), shape) * std).astype(param_dtype)

    return {
        "token_embedding": normal((cfg.vocab_size, w)),
        "position_embedding": normal((cfg.context_length, w)),
        "blocks": {
            "ln1_scale": jnp.ones((n, w), param_dtype),
            "ln1_bias": jnp.zeros((n, w), param_dtype),
            "q": normal((n, w, w)), "q_bias": jnp.zeros((n, w), param_dtype),
            "k": normal((n, w, w)), "k_bias": jnp.zeros((n, w), param_dtype),
            "v": normal((n, w, w)), "v_bias": jnp.zeros((n, w), param_dtype),
            "o": normal((n, w, w)), "o_bias": jnp.zeros((n, w), param_dtype),
            "ln2_scale": jnp.ones((n, w), param_dtype),
            "ln2_bias": jnp.zeros((n, w), param_dtype),
            "mlp_fc": normal((n, w, 4 * w)),
            "mlp_fc_bias": jnp.zeros((n, 4 * w), param_dtype),
            "mlp_proj": normal((n, 4 * w, w)),
            "mlp_proj_bias": jnp.zeros((n, w), param_dtype),
        },
        "final_ln_scale": jnp.ones((w,), param_dtype),
        "final_ln_bias": jnp.zeros((w,), param_dtype),
        "projection": normal((w, cfg.projection_dim), w ** -0.5),
    }


def clip_encode_text(
    params: Params,
    cfg: CLIPTextConfig,
    input_ids: jax.Array,        # (B, L) — EOT = max id position per row
    project: bool = True,
) -> jax.Array:
    """Returns (B, projection_dim) text embeddings (EOT pooled)."""
    x = params["token_embedding"].astype(cfg.dtype)[input_ids]
    L = input_ids.shape[1]
    x = x + params["position_embedding"].astype(cfg.dtype)[None, :L]
    causal = jnp.tril(jnp.ones((L, L), dtype=bool))
    bias = jnp.where(causal[None, None], 0.0, NEG_INF)

    def layer(carry, layer_p):
        return _encoder_block(
            layer_p, carry, bias, cfg.num_heads, cfg.layer_norm_epsilon
        ), None

    x, _ = jax.lax.scan(layer, x, params["blocks"])
    x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"],
                    cfg.layer_norm_epsilon)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    if project and "projection" in params:
        pooled = jnp.einsum(
            "bd,dp->bp", pooled, params["projection"].astype(pooled.dtype),
            preferred_element_type=jnp.float32,
        ).astype(pooled.dtype)
    return pooled


# ---------------------------------------------------------------------------
# Image preprocessing constants (OpenAI CLIP normalization)
# ---------------------------------------------------------------------------

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_images(images_uint8: jax.Array) -> jax.Array:
    """uint8 NHWC (B, H, W, 3) -> normalized float NHWC."""
    x = images_uint8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std
