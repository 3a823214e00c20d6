"""Fused transformer-block Pallas kernels.

Motivation (measured on v5e, ViT-B/32 @ 50 tokens): attention is ~1% of
the model FLOPs but ~half the runtime under XLA — the (B,L,H,D)->(B,H,L,D)
transposes, the fp32 score-tensor HBM traffic, and thousands of tiny
batched matmuls dominate; the LN/gelu/residual tensors round-trip HBM
every layer. These kernels keep whole (sub)blocks in VMEM per image
group, with bf16 matmul operands (full-rate MXU) and fp32
accumulation/softmax/residual stream. Layout stays (tokens, D)
throughout; heads are lane slices.

Kernel family (see README "Pallas kernel inventory" for measurements):
  fused_attention_block   qkv + attention + out-proj (legacy short-seq)
  fused_vit_block         whole CLIP pre-LN block (LN1+attn+LN2+MLP)
  attention_core          attention only, long sequences
  fused_mlp_block         LN + MLP + residual, long sequences
  t5_attention_core(_vjp) T5 scores + position bias + mask, + VJP
  fused_t5_ffn(_vjp)      RMS-norm + gated-gelu FFN + residual, + VJP
  fused_gpt2_block(_vjp)  whole GPT-2 causal block, + VJP
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_f32(z: jax.Array, scale, bias, eps: float) -> jax.Array:
    """LayerNorm over the last axis; `z` must already be fp32."""
    m = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - m), axis=-1, keepdims=True)
    return ((z - m) * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32) + bias.astype(jnp.float32))


def _tanh_gelu(x: jax.Array) -> jax.Array:
    """HF gelu_new (tanh approximation), fp32."""
    return 0.5 * x * (
        1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x))
    )


def _make_kernel(group: int, seq: int, num_heads: int, head_dim: int,
                 scale: float, out_dtype, compute_dtype=jnp.float32):
    d_model = num_heads * head_dim

    def kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
               wo_ref, bo_ref, o_ref):
        # matmul operands in compute_dtype (bf16 on TPU: full-rate MXU;
        # fp32 operands run the MXU at 1/4 throughput), accumulation and
        # softmax always in fp32
        wq = wq_ref[:].astype(compute_dtype)
        wk = wk_ref[:].astype(compute_dtype)
        wv = wv_ref[:].astype(compute_dtype)
        wo = wo_ref[:].astype(compute_dtype)

        def per_image(g, _):
            x = x_ref[g].astype(compute_dtype)        # (L, D)
            q = (jax.lax.dot_general(
                x, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bq_ref[:].astype(jnp.float32)).astype(compute_dtype)
            k = (jax.lax.dot_general(
                x, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bk_ref[:].astype(jnp.float32)).astype(compute_dtype)
            v = (jax.lax.dot_general(
                x, wv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bv_ref[:].astype(jnp.float32)).astype(compute_dtype)

            outs = []
            for h in range(num_heads):
                sl = slice(h * head_dim, (h + 1) * head_dim)
                qh = q[:, sl] * compute_dtype(scale)
                kh = k[:, sl]
                vh = v[:, sl]
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                       # (L, L) fp32
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(
                    compute_dtype
                )
                outs.append(jax.lax.dot_general(
                    p, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(compute_dtype))                # (L, head_dim)
            attn = jnp.concatenate(outs, axis=-1)       # (L, D)
            y = jax.lax.dot_general(
                attn, wo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bo_ref[:].astype(jnp.float32)
            o_ref[g] = y.astype(out_dtype)
            return 0

        jax.lax.fori_loop(0, group, per_image, 0)

    return kernel


def _make_bd_kernel(group: int, seq: int, num_heads: int, head_dim: int,
                    scale: float, out_dtype):
    """Block-diagonal variant: the whole image group rides the M axis.

    Projections become ONE (G*L, D) x (D, D) matmul and each head's
    scores ONE (G*L, G*L) matmul with cross-image entries masked to -inf
    before the softmax — G*x more score FLOPs, but every op is a large
    MXU matmul instead of G sequential slivers, and everything stays in
    VMEM. FLOP overhead at G=4, L=50 is ~3% of the whole ViT-B/32.
    """
    d_model = num_heads * head_dim
    gl = group * seq

    def kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
               wo_ref, bo_ref, o_ref):
        x = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        row_img = jax.lax.broadcasted_iota(jnp.int32, (gl, gl), 0) // seq
        col_img = jax.lax.broadcasted_iota(jnp.int32, (gl, gl), 1) // seq
        blockmask = jnp.where(row_img == col_img, 0.0, -1e30)

        def proj(w_ref, b_ref):
            return jax.lax.dot_general(
                x, w_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref[:].astype(jnp.float32)

        q = proj(wq_ref, bq_ref) * scale
        k = proj(wk_ref, bk_ref)
        v = proj(wv_ref, bv_ref)
        outs = []
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + blockmask                              # (GL, GL)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                p, v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        attn = jnp.concatenate(outs, axis=-1)
        y = jax.lax.dot_general(
            attn, wo_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[:].astype(jnp.float32)
        o_ref[:] = y.reshape(group, seq, d_model).astype(out_dtype)

    return kernel


def _make_core_kernel(group: int, num_heads: int, head_dim: int, out_dtype,
                      fast_exp: bool = False):
    # matmul OPERANDS stay in the input dtype (bf16 inputs -> full-rate
    # MXU; fp32 inputs keep exact legacy numerics); accumulation and the
    # softmax are always fp32 via preferred_element_type. The softmax
    # division is DEFERRED past the PV matmul — rescaling the (L, dh)
    # output instead of the (L, L) probability matrix drops a full
    # score-sized VPU pass per head (measured 136 -> 121 ms on the
    # 24-layer ViT-L attention stack). fast_exp computes the exp over the
    # (L, L) score matrix in bf16 instead of fp32 (probabilities are cast
    # to bf16 for the PV matmul anyway; ~1/256 relative error on p).
    def kernel(q_ref, k_ref, v_ref, o_ref):
        def per_image(g, _):
            q = q_ref[g]                           # (L, D), pre-scaled
            k = k_ref[g]
            v = v_ref[g]
            for h in range(num_heads):
                sl = slice(h * head_dim, (h + 1) * head_dim)
                s = jax.lax.dot_general(
                    q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = jnp.max(s, axis=-1, keepdims=True)
                if fast_exp:
                    p = jnp.exp((s - m).astype(jnp.bfloat16))
                    p = p.astype(q.dtype)           # UNNORMALIZED
                else:
                    p = jnp.exp(s - m).astype(q.dtype)  # UNNORMALIZED
                denom = jnp.sum(p.astype(jnp.float32), axis=-1,
                                keepdims=True)
                o = jax.lax.dot_general(
                    p, v[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[g, :, sl] = (o / denom).astype(out_dtype)
            return 0

        jax.lax.fori_loop(0, group, per_image, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_heads", "group", "fast_exp", "interpret")
)
def attention_core(
    q: jax.Array,   # (B, L, D) — PRE-SCALED queries, heads on lanes
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    group: int = 1,
    fast_exp: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Attention only (projections stay in XLA), native (B, L, D) layout —
    no transposes, scores stay in VMEM. For longer sequences where the
    full fused block's weights + activations would not fit VMEM
    (e.g. ViT-L/14@336's 577 tokens: +16% over the XLA path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = q.shape
    assert batch % group == 0, (batch, group)
    head_dim = d_model // num_heads
    spec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    return pl.pallas_call(
        _make_core_kernel(group, num_heads, head_dim, q.dtype, fast_exp),
        grid=(batch // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _make_ln_qkv_kernel(group: int, seq: int, d_model: int, scale: float,
                        eps: float, out_dtype):
    """bf16 twin of _make_qkv_q8_kernel: LN + q/k/v projections in one
    program (long-sequence split path). Emits PRE-SCALED q for
    attention_core; the LN output and its fp32 intermediates never touch
    HBM (XLA materializes the LN output once per projection consumer)."""
    gl = group * seq

    def kernel(x_ref, lns_ref, lnb_ref,
               wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
               q_ref, k_ref, v_ref):
        x32 = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        h = _ln_f32(x32, lns_ref[:], lnb_ref[:], eps).astype(jnp.bfloat16)

        def proj(w_ref, b_ref):
            return jax.lax.dot_general(
                h, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref[:].astype(jnp.float32)

        q = proj(wq_ref, bq_ref) * jnp.float32(scale)
        q_ref[:] = q.reshape(group, seq, d_model).astype(out_dtype)
        k_ref[:] = proj(wk_ref, bk_ref).reshape(
            group, seq, d_model).astype(out_dtype)
        v_ref[:] = proj(wv_ref, bv_ref).reshape(
            group, seq, d_model).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("scale", "group", "eps", "interpret")
)
def fused_ln_qkv(
    x: jax.Array,            # (B, L, D) — PRE-LN residual stream
    ln_scale: jax.Array, ln_bias: jax.Array,
    wq: jax.Array, bq: jax.Array,
    wk: jax.Array, bk: jax.Array,
    wv: jax.Array, bv: jax.Array,
    scale: float,
    group: int = 1,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
):
    """Returns (q*scale, k, v), each (B, L, D) in x.dtype (bf16 weights,
    ~6 MB VMEM at ViT-L widths — fits the default scoped budget)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    assert batch % group == 0, (batch, group)
    bf = jnp.bfloat16
    xspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((d_model,), lambda i: (0,))
    mat = pl.BlockSpec((d_model, d_model), lambda i: (0, 0))
    out = jax.ShapeDtypeStruct((batch, seq, d_model), x.dtype)
    return pl.pallas_call(
        _make_ln_qkv_kernel(group, seq, d_model, scale, eps, x.dtype),
        grid=(batch // group,),
        in_specs=[xspec, vec, vec, mat, vec, mat, vec, mat, vec],
        out_specs=[xspec, xspec, xspec],
        out_shape=[out, out, out],
        interpret=interpret,
    )(x, ln_scale, ln_bias, wq.astype(bf), bq, wk.astype(bf), bk,
      wv.astype(bf), bv)


def _make_core_oproj_kernel(group: int, num_heads: int, head_dim: int,
                            out_dtype):
    """attention core + out-projection + bias + residual in one program:
    the (L, D) attention output never round-trips HBM between the core
    and the out-proj (deferred softmax division as in _make_core_kernel)."""
    d_model = num_heads * head_dim

    def kernel(res_ref, q_ref, k_ref, v_ref, wo_ref, bo_ref, o_ref):
        wo = wo_ref[:]

        def per_image(g, _):
            q = q_ref[g]                           # (L, D), pre-scaled
            k = k_ref[g]
            v = v_ref[g]
            # Stage per-head outputs through the output ref (VMEM ref
            # stores take static slices; a traced-array .at[].set would
            # lower to `scatter`, which Mosaic cannot lower).
            for h in range(num_heads):
                sl = slice(h * head_dim, (h + 1) * head_dim)
                s = jax.lax.dot_general(
                    q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m).astype(q.dtype)  # UNNORMALIZED
                denom = jnp.sum(p.astype(jnp.float32), axis=-1,
                                keepdims=True)
                o = jax.lax.dot_general(
                    p, v[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[g, :, sl] = (o / denom).astype(out_dtype)
            y = jax.lax.dot_general(
                o_ref[g].astype(q.dtype), wo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bo_ref[:].astype(jnp.float32)
            o_ref[g] = (res_ref[g].astype(jnp.float32) + y).astype(out_dtype)
            return 0

        jax.lax.fori_loop(0, group, per_image, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_heads", "group", "interpret")
)
def attention_core_oproj(
    residual: jax.Array,   # (B, L, D) — the block's residual stream x
    q: jax.Array,          # (B, L, D) — PRE-SCALED queries
    k: jax.Array,
    v: jax.Array,
    wo: jax.Array, bo: jax.Array,
    num_heads: int,
    group: int = 1,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns residual + Attn(q,k,v) @ wo + bo in one program."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = q.shape
    assert batch % group == 0, (batch, group)
    head_dim = d_model // num_heads
    bf = jnp.bfloat16
    spec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    return pl.pallas_call(
        _make_core_oproj_kernel(group, num_heads, head_dim, residual.dtype),
        grid=(batch // group,),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((d_model, d_model), lambda i: (0, 0)),
                  pl.BlockSpec((d_model,), lambda i: (0,))],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model),
                                       residual.dtype),
        interpret=interpret,
    )(residual, q, k, v, wo.astype(bf), bo)


def _make_mlp_kernel(group: int, seq: int, d_model: int, d_ff: int,
                     eps: float, out_dtype, chunks: int = 1):
    gl = group * seq
    # chunks > 1 splits the row dimension into independent sub-blocks
    # (Python-unrolled, 8-aligned boundaries) so the Mosaic scheduler can
    # overlap chunk i's LN/GELU VPU chain with chunk i±1's MXU matmuls.
    step = -(-gl // chunks)            # ceil
    step = -(-step // 8) * 8           # round up to sublane multiple
    bounds = [(lo, min(lo + step, gl)) for lo in range(0, gl, step)]

    def kernel(x_ref, lns_ref, lnb_ref, wfc_ref, bfc_ref,
               wproj_ref, bproj_ref, o_ref):
        x32 = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        lns, lnb = lns_ref[:], lnb_ref[:]
        wfc, wproj = wfc_ref[:], wproj_ref[:]
        bfc = bfc_ref[:].astype(jnp.float32)
        bproj = bproj_ref[:].astype(jnp.float32)
        outs = []
        for lo, hi in bounds:
            xc = x32[lo:hi]
            h = _ln_f32(xc, lns, lnb, eps).astype(jnp.bfloat16)
            hid = jax.lax.dot_general(
                h, wfc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bfc
            hid = (hid * jax.nn.sigmoid(1.702 * hid)).astype(jnp.bfloat16)
            y = jax.lax.dot_general(
                hid, wproj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bproj
            outs.append((xc + y).astype(out_dtype))
        full = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        o_ref[:] = full.reshape(group, seq, d_model)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("group", "eps", "chunks", "interpret")
)
def fused_mlp_block(
    x: jax.Array,            # (B, L, D) — PRE-LN residual stream
    ln_scale: jax.Array, ln_bias: jax.Array,
    w_fc: jax.Array, b_fc: jax.Array,
    w_proj: jax.Array, b_proj: jax.Array,
    group: int = 1,
    eps: float = 1e-5,
    chunks: int = 1,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x + MLP(LN(x)) with quickGELU as one Pallas program: the gelu
    hidden tensor (4x the residual width) and the LN intermediates never
    touch HBM. Built for long sequences where the whole-block kernel's
    scores would not fit VMEM (e.g. ViT-L/14@336's 577 tokens).

    NOTE at production widths the weights (D x 4D x2 bf16 ~ 17 MB for
    D=1024) exceed the default 16 MB scoped-VMEM budget — callers must
    raise it first (utils/tpu_flags.ensure_scoped_vmem_limit)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    assert batch % group == 0, (batch, group)
    d_ff = w_fc.shape[1]
    bf = jnp.bfloat16
    xspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((d_model,), lambda i: (0,))
    return pl.pallas_call(
        _make_mlp_kernel(group, seq, d_model, d_ff, eps, x.dtype, chunks),
        grid=(batch // group,),
        in_specs=[
            xspec, vec, vec,
            pl.BlockSpec((d_model, d_ff), lambda i: (0, 0)),
            pl.BlockSpec((d_ff,), lambda i: (0,)),
            pl.BlockSpec((d_ff, d_model), lambda i: (0, 0)),
            vec,
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model), x.dtype),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_fc.astype(bf), b_fc, w_proj.astype(bf),
      b_proj)


def _make_mlp_q8_kernel(group: int, seq: int, d_model: int, d_ff: int,
                        eps: float, out_dtype):
    """int8 twin of _make_mlp_kernel: both MLP matmuls int8 on the MXU;
    the per-row activation quant passes stay in VMEM (in XLA they
    round-trip the (B,L,4D) hidden through HBM and erase the win —
    measured neutral 199.6 vs 204.4 ms at ViT-L shapes)."""
    gl = group * seq

    def kernel(x_ref, lns_ref, lnb_ref, wfc_ref, sfc_ref, bfc_ref,
               wpr_ref, spr_ref, bpr_ref, o_ref):
        x32 = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        h = _ln_f32(x32, lns_ref[:], lnb_ref[:], eps)
        hq, hs = _row_quant_i8(h)
        acc = jax.lax.dot_general(
            hq, wfc_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        hid = (acc.astype(jnp.float32) * hs * sfc_ref[:].astype(jnp.float32)
               + bfc_ref[:].astype(jnp.float32))
        hid = hid * jax.nn.sigmoid(1.702 * hid)          # quickGELU fp32
        gq, gs = _row_quant_i8(hid)
        acc2 = jax.lax.dot_general(
            gq, wpr_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc2.astype(jnp.float32) * gs
             * spr_ref[:].astype(jnp.float32)
             + bpr_ref[:].astype(jnp.float32))
        o_ref[:] = (x32 + y).reshape(group, seq, d_model).astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("group", "eps", "interpret"))
def fused_mlp_block_q8(
    x: jax.Array,            # (B, L, D) — PRE-LN residual stream
    ln_scale: jax.Array, ln_bias: jax.Array,
    w_fc: jax.Array, s_fc: jax.Array, b_fc: jax.Array,     # int8 + scales
    w_proj: jax.Array, s_proj: jax.Array, b_proj: jax.Array,
    group: int = 1,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x + MLP(LN(x)) with both matmuls int8 (weights pre-quantized per
    output channel, activations per row in VMEM). Same scoped-VMEM note
    as fused_mlp_block (weights resident; int8 halves that footprint)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    assert batch % group == 0, (batch, group)
    d_ff = w_fc.shape[1]
    xspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((d_model,), lambda i: (0,))
    ff_vec = pl.BlockSpec((d_ff,), lambda i: (0,))
    return pl.pallas_call(
        _make_mlp_q8_kernel(group, seq, d_model, d_ff, eps, x.dtype),
        grid=(batch // group,),
        in_specs=[
            xspec, vec, vec,
            pl.BlockSpec((d_model, d_ff), lambda i: (0, 0)), ff_vec, ff_vec,
            pl.BlockSpec((d_ff, d_model), lambda i: (0, 0)), vec, vec,
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model), x.dtype),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_fc, s_fc, b_fc, w_proj, s_proj, b_proj)


def _make_qkv_q8_kernel(group: int, seq: int, d_model: int, scale: float,
                        eps: float, out_dtype):
    """LN + q/k/v int8 projections in one program (long-sequence path
    where the whole block doesn't fit VMEM). Emits PRE-SCALED q for
    attention_core."""
    gl = group * seq

    def kernel(x_ref, lns_ref, lnb_ref,
               wqkv_ref, sqkv_ref, bqkv_ref, q_ref, k_ref, v_ref):
        x32 = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        h = _ln_f32(x32, lns_ref[:], lnb_ref[:], eps)
        hq, hs = _row_quant_i8(h)
        acc = jax.lax.dot_general(
            hq, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        qkv = (acc.astype(jnp.float32) * hs
               * sqkv_ref[:].astype(jnp.float32)
               + bqkv_ref[:].astype(jnp.float32))
        q = qkv[:, :d_model] * jnp.float32(scale)
        q_ref[:] = q.reshape(group, seq, d_model).astype(out_dtype)
        k_ref[:] = qkv[:, d_model:2 * d_model].reshape(
            group, seq, d_model).astype(out_dtype)
        v_ref[:] = qkv[:, 2 * d_model:].reshape(
            group, seq, d_model).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("scale", "group", "eps", "interpret")
)
def fused_qkv_q8(
    x: jax.Array,            # (B, L, D) — PRE-LN residual stream
    ln_scale: jax.Array, ln_bias: jax.Array,
    w_qkv: jax.Array, s_qkv: jax.Array, b_qkv: jax.Array,  # (D, 3D)/(3D,)
    scale: float,
    group: int = 1,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
):
    """Returns (q*scale, k, v), each (B, L, D) in x.dtype; w_qkv is the
    column-concatenated int8 q|k|v matrix with per-channel fp32 scales
    (quantize_weight_i8 on the concat) — the shared LN'd input is
    quantized once and projected in ONE MXU matmul."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    assert batch % group == 0, (batch, group)
    assert w_qkv.shape == (d_model, 3 * d_model), w_qkv.shape
    xspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((d_model,), lambda i: (0,))
    vec3 = pl.BlockSpec((3 * d_model,), lambda i: (0,))
    out = jax.ShapeDtypeStruct((batch, seq, d_model), x.dtype)
    return pl.pallas_call(
        _make_qkv_q8_kernel(group, seq, d_model, scale, eps, x.dtype),
        grid=(batch // group,),
        in_specs=[xspec, vec, vec,
                  pl.BlockSpec((d_model, 3 * d_model), lambda i: (0, 0)),
                  vec3, vec3],
        out_specs=[xspec, xspec, xspec],
        out_shape=[out, out, out],
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_qkv, s_qkv, b_qkv)


def _make_t5_ffn_kernel(group: int, seq: int, d_model: int, d_ff: int,
                        gated: bool, eps: float, out_dtype):
    gl = group * seq

    def kernel(*refs):
        if gated:
            x_ref, lnw_ref, wi0_ref, wi1_ref, wo_ref, o_ref = refs
        else:
            x_ref, lnw_ref, wi0_ref, wo_ref, o_ref = refs
            wi1_ref = None
        x32 = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        # T5 RMS norm (no mean subtraction, scale only)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        h = (x32 * jax.lax.rsqrt(var + eps)
             * lnw_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        hid = jax.lax.dot_general(
            h, wi0_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hid = _tanh_gelu(hid)  # HF gelu_new, fp32
        if gated:
            lin = jax.lax.dot_general(
                h, wi1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hid = hid * lin
        y = jax.lax.dot_general(
            hid.astype(jnp.bfloat16), wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (x32 + y).reshape(group, seq, d_model).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("group", "eps", "interpret")
)
def fused_t5_ffn(
    x: jax.Array,            # (B, L, D) — PRE-NORM residual stream
    ln_weight: jax.Array,    # (D,) RMS-norm scale
    wi_0: jax.Array,         # (D, F)
    wi_1: Optional[jax.Array],  # (D, F) gate, or None for non-gated
    wo: jax.Array,           # (F, D)
    group: int = 1,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x + FFN(RMSNorm(x)) for T5 v1.1-style gated-gelu (or plain) FFNs
    as one Pallas program, all three weight matrices resident in VMEM.

    At T0-3B widths (D=2048, F=5120) the weights are ~63 MB bf16 — far
    over the default 16 MB scoped-VMEM budget; callers must raise it
    (utils/tpu_flags.ensure_scoped_vmem_limit(98304)) before backend
    init. Reference FFN math: /root/reference/src/models/vct0.py uses HF
    T5 whose DenseGatedActDense this reproduces (gelu_new, no biases)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    assert batch % group == 0, (batch, group)
    d_ff = wi_0.shape[1]
    bf = jnp.bfloat16
    gated = wi_1 is not None
    xspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    in_specs = [
        xspec,
        pl.BlockSpec((d_model,), lambda i: (0,)),
        pl.BlockSpec((d_model, d_ff), lambda i: (0, 0)),
    ]
    args = [x, ln_weight, wi_0.astype(bf)]
    if gated:
        in_specs.append(pl.BlockSpec((d_model, d_ff), lambda i: (0, 0)))
        args.append(wi_1.astype(bf))
    in_specs.append(pl.BlockSpec((d_ff, d_model), lambda i: (0, 0)))
    args.append(wo.astype(bf))
    return pl.pallas_call(
        _make_t5_ffn_kernel(group, seq, d_model, d_ff, gated, eps, x.dtype),
        grid=(batch // group,),
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model), x.dtype),
        interpret=interpret,
    )(*args)


def _row_quant_i8(h: jax.Array) -> tuple:
    """Per-row symmetric int8 quantization of an fp32 (rows, D) tile.
    Returns (int8 values, per-row fp32 dequant scales)."""
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(h / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight_i8(w) -> tuple:
    """Per-output-channel symmetric int8 quantization of a (D_in, D_out)
    weight matrix (host-side, once). Returns (int8 weights, (D_out,)
    fp32 dequant scales)."""
    import numpy as np

    w = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def _make_vit_block_q8_kernel(group: int, seq: int, num_heads: int,
                              head_dim: int, scale: float, eps: float,
                              out_dtype):
    """int8 variant of the whole-ViT-block kernel: the projection
    matmuls (fused qkv / o / fc / proj) run int8 x int8 -> int32 on the MXU
    (measured 366 TOPS on this v5e vs 190.6 TFLOP/s bf16); activations
    are re-quantized per row in VMEM before each matmul; attention
    scores/PV stay bf16 (=<4% of FLOPs); LN, softmax, and the residual
    stream stay fp32. Weights must be pre-quantized per output channel
    (quantize_weight_i8)."""
    d_model = num_heads * head_dim
    gl = group * seq

    def mm_q8(h32, w_ref, s_ref):
        hq, hs = _row_quant_i8(h32)
        acc = jax.lax.dot_general(
            hq, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * hs * s_ref[:].astype(jnp.float32)

    def kernel(x_ref, ln1s_ref, ln1b_ref,
               wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
               ln2s_ref, ln2b_ref,
               wfc_ref, sfc_ref, bfc_ref, wpr_ref, spr_ref, bpr_ref,
               o_ref):
        x32 = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        h = _ln_f32(x32, ln1s_ref[:], ln1b_ref[:], eps)

        # q/k/v share the input h: quantize it ONCE and run one
        # (d_model, 3*d_model) int8 matmul instead of three — 2 fewer
        # VPU quant passes per block and a 3x larger MXU program
        # (same trick as the split3 fused_qkv_q8 path).
        qkv = mm_q8(h, wqkv_ref, sqkv_ref) + bqkv_ref[:].astype(jnp.float32)
        q = qkv[:, :d_model] * jnp.float32(scale)
        k = qkv[:, d_model:2 * d_model]
        v = qkv[:, 2 * d_model:]

        row_img = jax.lax.broadcasted_iota(jnp.int32, (gl, gl), 0) // seq
        col_img = jax.lax.broadcasted_iota(jnp.int32, (gl, gl), 1) // seq
        blockmask = jnp.where(row_img == col_img, 0.0, -1e30)

        outs = []
        for hd in range(num_heads):
            sl = slice(hd * head_dim, (hd + 1) * head_dim)
            s = jax.lax.dot_general(
                q[:, sl].astype(jnp.bfloat16), k[:, sl].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + blockmask
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            outs.append(jax.lax.dot_general(
                p, v[:, sl].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        attn = jnp.concatenate(outs, axis=-1)
        y = mm_q8(attn, wo_ref, so_ref) + bo_ref[:].astype(jnp.float32)
        r1 = x32 + y

        h2 = _ln_f32(r1, ln2s_ref[:], ln2b_ref[:], eps)
        hid = mm_q8(h2, wfc_ref, sfc_ref) + bfc_ref[:].astype(jnp.float32)
        hid = hid * jax.nn.sigmoid(1.702 * hid)          # quickGELU fp32
        mlp = mm_q8(hid, wpr_ref, spr_ref) + bpr_ref[:].astype(jnp.float32)
        o_ref[:] = (r1 + mlp).reshape(group, seq, d_model).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_heads", "group", "eps", "interpret")
)
def fused_vit_block_q8(
    x: jax.Array,            # (B, L, D) — PRE-LN residual stream
    ln1_scale: jax.Array, ln1_bias: jax.Array,
    w_qkv: jax.Array, s_qkv: jax.Array, b_qkv: jax.Array,  # (D, 3D)/(3D,)
    wo: jax.Array, so: jax.Array, bo: jax.Array,
    ln2_scale: jax.Array, ln2_bias: jax.Array,
    w_fc: jax.Array, s_fc: jax.Array, b_fc: jax.Array,
    w_proj: jax.Array, s_proj: jax.Array, b_proj: jax.Array,
    num_heads: int,
    group: int = 4,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """int8 whole-ViT-block kernel; weight args are int8 matrices with
    per-output-channel fp32 scales (quantize_weight_i8); q/k/v are fused
    into one (D, 3D) matrix so the shared input is quantized once.
    Opt-in for bulk feature extraction where int8-level embedding drift
    is acceptable (cosine vs the bf16 kernel pinned in tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    # same contract as the bf16 twin fused_vit_block: an explicit group
    # must divide the batch (callers using _fused_group always satisfy
    # this) — silent degradation would hide a 4x program-count regression
    assert batch % group == 0, (batch, group)
    head_dim = d_model // num_heads
    scale = head_dim ** -0.5
    d_ff = w_fc.shape[1]
    kernel = _make_vit_block_q8_kernel(group, seq, num_heads, head_dim,
                                       scale, eps, x.dtype)
    xspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((d_model,), lambda i: (0,))
    vec3 = pl.BlockSpec((3 * d_model,), lambda i: (0,))
    ff_vec = pl.BlockSpec((d_ff,), lambda i: (0,))
    mat = pl.BlockSpec((d_model, d_model), lambda i: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(batch // group,),
        in_specs=[
            xspec, vec, vec,
            pl.BlockSpec((d_model, 3 * d_model), lambda i: (0, 0)),
            vec3, vec3, mat, vec, vec,
            vec, vec,
            pl.BlockSpec((d_model, d_ff), lambda i: (0, 0)), ff_vec, ff_vec,
            pl.BlockSpec((d_ff, d_model), lambda i: (0, 0)), vec, vec,
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model), x.dtype),
        interpret=interpret,
    )(x, ln1_scale, ln1_bias,
      w_qkv, s_qkv, b_qkv, wo, so, bo,
      ln2_scale, ln2_bias, w_fc, s_fc, b_fc, w_proj, s_proj, b_proj)


def _make_gpt2_block_kernel(group: int, seq: int, num_heads: int,
                            head_dim: int, scale: float, eps: float,
                            out_dtype):
    """GPT-2 pre-LN block, one program per image group (block-diagonal
    CAUSAL attention): LN1 + fused-QKV + attention + out-proj + residual
    + LN2 + MLP(tanh-gelu) + residual. bf16 matmul operands, fp32
    accumulation/softmax/residual-stream."""
    d_model = num_heads * head_dim
    gl = group * seq

    def kernel(x_ref, mask_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
               wo_ref, bo_ref, ln2s_ref, ln2b_ref,
               wfc_ref, bfc_ref, wproj_ref, bproj_ref, o_ref):
        x32 = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        h = _ln_f32(x32, ln1s_ref[:], ln1b_ref[:], eps).astype(jnp.bfloat16)
        qkv = jax.lax.dot_general(
            h, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[:].astype(jnp.float32)               # (GL, 3D)
        q = qkv[:, :d_model] * jnp.float32(scale)
        k = qkv[:, d_model:2 * d_model]
        v = qkv[:, 2 * d_model:]

        row_img = jax.lax.broadcasted_iota(jnp.int32, (gl, gl), 0) // seq
        col_img = jax.lax.broadcasted_iota(jnp.int32, (gl, gl), 1) // seq
        row_pos = jax.lax.broadcasted_iota(jnp.int32, (gl, gl), 0) % seq
        col_pos = jax.lax.broadcasted_iota(jnp.int32, (gl, gl), 1) % seq
        visible = (row_img == col_img) & (row_pos >= col_pos)
        key_valid = mask_ref[0] > 0                       # (1, GL)
        blockmask = jnp.where(visible & key_valid, 0.0, -1e30)

        outs = []
        for hd in range(num_heads):
            sl = slice(hd * head_dim, (hd + 1) * head_dim)
            s = jax.lax.dot_general(
                q[:, sl].astype(jnp.bfloat16),
                k[:, sl].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + blockmask
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            outs.append(jax.lax.dot_general(
                p, v[:, sl].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        attn = jnp.concatenate(outs, axis=-1).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            attn, wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[:].astype(jnp.float32)
        r1 = x32 + y

        h2 = _ln_f32(r1, ln2s_ref[:], ln2b_ref[:], eps).astype(jnp.bfloat16)
        hid = jax.lax.dot_general(
            h2, wfc_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc_ref[:].astype(jnp.float32)
        hid = _tanh_gelu(hid)
        mlp = jax.lax.dot_general(
            hid.astype(jnp.bfloat16), wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[:].astype(jnp.float32)
        o_ref[:] = (r1 + mlp).reshape(group, seq, d_model).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_heads", "group", "eps", "interpret")
)
def fused_gpt2_block(
    x: jax.Array,            # (B, L, D) — PRE-LN residual stream
    mask: jax.Array,         # (B, L) key-validity (1 = real token)
    ln1_scale: jax.Array, ln1_bias: jax.Array,
    w_qkv: jax.Array, b_qkv: jax.Array,     # (D, 3D), (3D,)
    w_out: jax.Array, b_out: jax.Array,
    ln2_scale: jax.Array, ln2_bias: jax.Array,
    w_fc: jax.Array, b_fc: jax.Array,
    w_proj: jax.Array, b_proj: jax.Array,
    num_heads: int,
    group: int = 4,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Full pre-LN GPT-2 encoder/decoder-teacher-forcing block (causal,
    tanh-approx gelu) as one Pallas program. Reference behavior:
    /root/reference/src/models/clipcap.py:290-342 drives HF GPT2Model
    blocks; this fuses one whole block per image group."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    while batch % group:
        group //= 2
    group = max(group, 1)
    head_dim = d_model // num_heads
    scale = head_dim ** -0.5
    d_ff = w_fc.shape[1]
    bf = jnp.bfloat16
    kernel = _make_gpt2_block_kernel(group, seq, num_heads, head_dim,
                                     scale, eps, x.dtype)
    xspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((d_model,), lambda i: (0,))
    return pl.pallas_call(
        kernel,
        grid=(batch // group,),
        in_specs=[
            xspec,
            # mask is pre-flattened to (B/G, 1, G*L) so the kernel reads
            # a (1, GL) slab without an in-kernel fold (TPU block shapes
            # need the last-two dims tile-aligned or full)
            pl.BlockSpec((1, 1, group * seq), lambda i: (i, 0, 0)),
            vec, vec,
            pl.BlockSpec((d_model, 3 * d_model), lambda i: (0, 0)),
            pl.BlockSpec((3 * d_model,), lambda i: (0,)),
            pl.BlockSpec((d_model, d_model), lambda i: (0, 0)), vec,
            vec, vec,
            pl.BlockSpec((d_model, d_ff), lambda i: (0, 0)),
            pl.BlockSpec((d_ff,), lambda i: (0,)),
            pl.BlockSpec((d_ff, d_model), lambda i: (0, 0)), vec,
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model), x.dtype),
        interpret=interpret,
    )(x, mask.astype(jnp.int32).reshape(batch // group, 1, group * seq),
      ln1_scale, ln1_bias,
      w_qkv.astype(bf), b_qkv, w_out.astype(bf), b_out,
      ln2_scale, ln2_bias, w_fc.astype(bf), b_fc, w_proj.astype(bf),
      b_proj)


def _gpt2_block_reference(x, mask, ln1_scale, ln1_bias, w_qkv, b_qkv,
                          w_out, b_out, ln2_scale, ln2_bias, w_fc, b_fc,
                          w_proj, b_proj, num_heads, eps):
    """Pure-XLA twin of fused_gpt2_block (same math) for the VJP
    recompute path."""
    batch, seq, d_model = x.shape
    head_dim = d_model // num_heads
    bf = jnp.bfloat16
    x32 = x.astype(jnp.float32)
    h = _ln_f32(x32, ln1_scale, ln1_bias, eps).astype(bf)
    qkv = jnp.einsum("bld,de->ble", h, w_qkv.astype(bf),
                     preferred_element_type=jnp.float32)
    qkv = qkv + b_qkv.astype(jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = (q * (head_dim ** -0.5)).reshape(batch, seq, num_heads, head_dim)
    k = k.reshape(batch, seq, num_heads, head_dim)
    v = v.reshape(batch, seq, num_heads, head_dim)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(bf), k.astype(bf),
                   preferred_element_type=jnp.float32)
    causal = jnp.tril(jnp.ones((seq, seq), dtype=bool))
    s = s + jnp.where(causal[None, None]
                      & (mask[:, None, None, :] > 0), 0.0, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(bf)
    attn = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(bf),
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(batch, seq, d_model).astype(bf)
    y = jnp.einsum("ble,ed->bld", attn, w_out.astype(bf),
                   preferred_element_type=jnp.float32)
    r1 = x32 + y + b_out.astype(jnp.float32)
    h2 = _ln_f32(r1, ln2_scale, ln2_bias, eps).astype(bf)
    hid = jnp.einsum("bld,df->blf", h2, w_fc.astype(bf),
                     preferred_element_type=jnp.float32)
    hid = _tanh_gelu(hid + b_fc.astype(jnp.float32))
    mlp = jnp.einsum("blf,fd->bld", hid.astype(bf), w_proj.astype(bf),
                     preferred_element_type=jnp.float32)
    return (r1 + mlp + b_proj.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15))
def fused_gpt2_block_vjp(x, mask, ln1_scale, ln1_bias, w_qkv, b_qkv,
                         w_out, b_out, ln2_scale, ln2_bias, w_fc, b_fc,
                         w_proj, b_proj, num_heads, eps=1e-5):
    """Differentiable wrapper: fused kernel forward, recompute backward
    through the XLA twin (ClipCap training backprops through the frozen
    GPT-2 into the mapper)."""
    return fused_gpt2_block(
        x, mask, ln1_scale, ln1_bias, w_qkv, b_qkv, w_out, b_out,
        ln2_scale, ln2_bias, w_fc, b_fc, w_proj, b_proj,
        num_heads=num_heads, eps=eps,
    )


def _fused_gpt2_fwd(x, mask, ln1_scale, ln1_bias, w_qkv, b_qkv, w_out,
                    b_out, ln2_scale, ln2_bias, w_fc, b_fc, w_proj,
                    b_proj, num_heads, eps):
    out = fused_gpt2_block(
        x, mask, ln1_scale, ln1_bias, w_qkv, b_qkv, w_out, b_out,
        ln2_scale, ln2_bias, w_fc, b_fc, w_proj, b_proj,
        num_heads=num_heads, eps=eps,
    )
    return out, (x, mask, ln1_scale, ln1_bias, w_qkv, b_qkv, w_out,
                 b_out, ln2_scale, ln2_bias, w_fc, b_fc, w_proj, b_proj)


def _fused_gpt2_bwd(num_heads, eps, residuals, d_out):
    (x, mask, ln1_scale, ln1_bias, w_qkv, b_qkv, w_out, b_out,
     ln2_scale, ln2_bias, w_fc, b_fc, w_proj, b_proj) = residuals
    _, vjp_fn = jax.vjp(
        lambda x_, l1s, l1b, wq, bq, wo_, bo_, l2s, l2b, wf, bf_, wp, bp:
        _gpt2_block_reference(x_, mask, l1s, l1b, wq, bq, wo_, bo_,
                              l2s, l2b, wf, bf_, wp, bp, num_heads, eps),
        x, ln1_scale, ln1_bias, w_qkv, b_qkv, w_out, b_out,
        ln2_scale, ln2_bias, w_fc, b_fc, w_proj, b_proj,
    )
    grads = vjp_fn(d_out)
    import numpy as np

    if jnp.issubdtype(mask.dtype, jnp.floating):
        dmask = jnp.zeros_like(mask)
    else:
        dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return (grads[0], dmask) + grads[1:]


fused_gpt2_block_vjp.defvjp(_fused_gpt2_fwd, _fused_gpt2_bwd)


def _t5_ffn_reference(x, ln_weight, wi_0, wi_1, wo, eps):
    """Pure-XLA twin of fused_t5_ffn (same math: fp32 rms-norm, bf16
    matmul operands with fp32 accumulation, tanh-approx gelu). Used as
    the recompute path in the custom VJP."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    h = (x32 * jax.lax.rsqrt(var + eps)
         * ln_weight.astype(jnp.float32)).astype(jnp.bfloat16)
    hid = jnp.einsum("bld,df->blf", h, wi_0.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    hid = _tanh_gelu(hid)
    if wi_1 is not None:
        lin = jnp.einsum("bld,df->blf", h, wi_1.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        hid = hid * lin
    y = jnp.einsum("blf,fd->bld", hid.astype(jnp.bfloat16),
                   wo.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return (x32 + y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_t5_ffn_vjp(x, ln_weight, wi_0, wi_1, wo, eps=1e-6):
    """Differentiable wrapper: Pallas kernel forward, gradients via
    recomputation through the XLA twin (the kernel materializes neither
    the normed input nor the gelu hidden, which the backward needs)."""
    return fused_t5_ffn(x, ln_weight, wi_0, wi_1, wo, eps=eps)


def _fused_t5_ffn_fwd(x, ln_weight, wi_0, wi_1, wo, eps):
    out = fused_t5_ffn(x, ln_weight, wi_0, wi_1, wo, eps=eps)
    return out, (x, ln_weight, wi_0, wi_1, wo)


def _fused_t5_ffn_bwd(eps, residuals, d_out):
    x, ln_weight, wi_0, wi_1, wo = residuals
    if wi_1 is None:
        _, vjp_fn = jax.vjp(
            lambda x_, lw_, w0_, wo_: _t5_ffn_reference(
                x_, lw_, w0_, None, wo_, eps
            ),
            x, ln_weight, wi_0, wo,
        )
        dx, dlw, dw0, dwo = vjp_fn(d_out)
        return dx, dlw, dw0, None, dwo
    _, vjp_fn = jax.vjp(
        lambda x_, lw_, w0_, w1_, wo_: _t5_ffn_reference(
            x_, lw_, w0_, w1_, wo_, eps
        ),
        x, ln_weight, wi_0, wi_1, wo,
    )
    return vjp_fn(d_out)


fused_t5_ffn_vjp.defvjp(_fused_t5_ffn_fwd, _fused_t5_ffn_bwd)


def _make_t5_core_kernel(heads_per_block: int, head_dim: int, out_dtype):
    # matmul operands stay in the input dtype (bf16 -> full-rate MXU);
    # scores/softmax accumulate fp32; the softmax division is deferred
    # past PV (rescale the (L, dh) output, not the (L, L) probabilities)
    def kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
        key_bias = jnp.where(
            mask_ref[0] > 0, 0.0, -1e9
        )                                       # (1, L), broadcasts over q
        for j in range(heads_per_block):
            sl = slice(j * head_dim, (j + 1) * head_dim)
            q = q_ref[0, :, sl]                       # (L, dh) — UNSCALED
            k = k_ref[0, :, sl]
            v = v_ref[0, :, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + bias_ref[j].astype(jnp.float32) + key_bias
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m).astype(q.dtype)        # UNNORMALIZED
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, sl] = (o / denom).astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def t5_attention_core(
    q: jax.Array,          # (B, L, D) — UNSCALED (T5 convention)
    k: jax.Array,
    v: jax.Array,
    pos_bias: jax.Array,   # (H, L, L) — relative position bias
    mask: jax.Array,       # (B, L) key-validity mask
    num_heads: int,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """T5 encoder self-attention core: scores + position bias + mask +
    softmax + PV, all in VMEM.

    Each program handles one batch row and a 128-lane group of heads
    (Mosaic needs the minor block dim divisible by 128; head slicing
    happens inside the kernel). Grid is ordered (head-groups, batch) so a
    group's bias blocks are DMA'd once and reused across the batch. Under
    XLA this attention was 42.6% of T0-3B encoder runtime at 557 tokens
    (the (B,H,L,L) fp32 bias and score tensors are materialized in HBM
    every layer); here neither ever leaves VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = q.shape
    head_dim = d_model // num_heads
    # largest divisor of num_heads whose lane width reaches 128 (or covers
    # the whole width for small test models)
    max_hpb = min(num_heads, max(1, 128 // head_dim))
    heads_per_block = next(
        h for h in range(max_hpb, 0, -1) if num_heads % h == 0
    )
    lanes = heads_per_block * head_dim
    qkv_spec = pl.BlockSpec((1, seq, lanes), lambda h, b: (b, 0, h))
    return pl.pallas_call(
        _make_t5_core_kernel(heads_per_block, head_dim, q.dtype),
        grid=(num_heads // heads_per_block, batch),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((heads_per_block, seq, seq),
                         lambda h, b: (h, 0, 0)),
            pl.BlockSpec((1, 1, seq), lambda h, b: (b, 0, 0)),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model), q.dtype),
        interpret=interpret,
    )(q, k, v, pos_bias, mask[:, None, :])


def _t5_attention_reference(q, k, v, pos_bias, mask, num_heads):
    """Pure-XLA twin of the t5_attention_core kernel (identical math:
    fp32 scores, UNSCALED q, additive position bias, -1e9 key mask).
    Used as the recompute path in the custom VJP."""
    batch, seq, d_model = q.shape
    head_dim = d_model // num_heads

    def split(x):
        return x.reshape(batch, seq, num_heads, head_dim).astype(jnp.float32)

    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
    s = s + pos_bias[None].astype(jnp.float32)
    s = s + jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return out.reshape(batch, seq, d_model).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def t5_attention_core_vjp(q, k, v, pos_bias, mask, num_heads):
    """Differentiable wrapper: the fused Pallas kernel on the forward
    pass, gradients via recomputation through the XLA twin (the backward
    of attention needs the probability matrix, which the kernel never
    materializes — recompute trades those FLOPs for the fwd VMEM win)."""
    return t5_attention_core(q, k, v, pos_bias, mask, num_heads)


def _t5_attention_core_fwd(q, k, v, pos_bias, mask, num_heads):
    out = t5_attention_core(q, k, v, pos_bias, mask, num_heads)
    return out, (q, k, v, pos_bias, mask)


def _t5_attention_core_bwd(num_heads, residuals, d_out):
    q, k, v, pos_bias, mask = residuals
    _, vjp_fn = jax.vjp(
        lambda q_, k_, v_, b_: _t5_attention_reference(
            q_, k_, v_, b_, mask, num_heads
        ),
        q, k, v, pos_bias,
    )
    dq, dk, dv, dbias = vjp_fn(d_out)
    if jnp.issubdtype(mask.dtype, jnp.floating):
        dmask = jnp.zeros_like(mask)
    else:
        import numpy as np

        dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dbias, dmask


t5_attention_core_vjp.defvjp(_t5_attention_core_fwd, _t5_attention_core_bwd)


def _make_vit_block_kernel(group: int, seq: int, num_heads: int,
                           head_dim: int, scale: float, eps: float,
                           out_dtype, deferred_div: bool = False,
                           fast_exp: bool = False):
    """Whole transformer block in one program: LN1 + QKV + block-diagonal
    attention + out-proj + residual + LN2 + MLP(quickGELU) + residual.

    All matmul operands are bf16 (full-rate MXU) with fp32 accumulation;
    layer norms, softmax, and the residual stream stay fp32 in VMEM. HBM
    traffic per block is one read + one write of x plus the (grid-constant)
    weights — the LN/gelu/residual tensors XLA was round-tripping per
    layer never leave VMEM.
    """
    d_model = num_heads * head_dim
    gl = group * seq

    def kernel(x_ref, ln1s_ref, ln1b_ref,
               wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
               wo_ref, bo_ref, ln2s_ref, ln2b_ref,
               wfc_ref, bfc_ref, wproj_ref, bproj_ref, o_ref):
        x32 = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        h = _ln_f32(x32, ln1s_ref[:], ln1b_ref[:], eps).astype(jnp.bfloat16)

        def proj(w_ref, b_ref):
            return jax.lax.dot_general(
                h, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref[:].astype(jnp.float32)

        q = proj(wq_ref, bq_ref) * jnp.float32(scale)
        k = proj(wk_ref, bk_ref)
        v = proj(wv_ref, bv_ref)

        row_img = jax.lax.broadcasted_iota(jnp.int32, (gl, gl), 0) // seq
        col_img = jax.lax.broadcasted_iota(jnp.int32, (gl, gl), 1) // seq
        blockmask = jnp.where(row_img == col_img, 0.0, -1e30)

        outs = []
        for hd in range(num_heads):
            sl = slice(hd * head_dim, (hd + 1) * head_dim)
            s = jax.lax.dot_general(
                q[:, sl].astype(jnp.bfloat16), k[:, sl].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + blockmask                               # (GL, GL) fp32
            m = jnp.max(s, axis=-1, keepdims=True)
            if fast_exp:
                # bf16 exp + deferred division: the per-head fp32
                # softmax chain (exp + div over (GL, GL)) is the
                # measured gap between the ViT-B block stack and its
                # FLOP bound (tools/vit_b_study.py). Unlike plain
                # deferred_div (3.5% slower here — extra bf16 cast of
                # p), fast_exp produces p in bf16 directly, so deferring
                # the division costs nothing and drops a full
                # score-sized fp32 VPU pass. ~1/256 relative error on p
                # (cosine vs exact pinned in test_fused_vit_block.py).
                p = jnp.exp((s - m).astype(jnp.bfloat16))
                denom = jnp.sum(p.astype(jnp.float32), axis=-1,
                                keepdims=True)
                pv = jax.lax.dot_general(
                    p, v[:, sl].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append(pv / denom)
                continue
            p = jnp.exp(s - m)
            if deferred_div:
                # rescale the (GL, head_dim) PV output instead of the
                # (GL, GL) probabilities — wins at long L (ViT-L's 577)
                denom = jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16),
                    v[:, sl].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append(pv / denom)
            else:
                # deferred-div was measured 3.5% SLOWER here (14.3k vs
                # 14.9k img/s): at GL=200 the extra bf16 cast of p
                # outweighs the saved division pass, unlike at L=577
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(
                    jnp.bfloat16
                )
                outs.append(jax.lax.dot_general(
                    p, v[:, sl].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
        attn = jnp.concatenate(outs, axis=-1).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            attn, wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[:].astype(jnp.float32)
        r1 = x32 + y                                    # residual 1 (fp32)

        h2 = _ln_f32(r1, ln2s_ref[:], ln2b_ref[:], eps).astype(jnp.bfloat16)
        hid = jax.lax.dot_general(
            h2, wfc_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc_ref[:].astype(jnp.float32)
        hid = (hid * jax.nn.sigmoid(1.702 * hid)).astype(jnp.bfloat16)
        mlp = jax.lax.dot_general(
            hid, wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[:].astype(jnp.float32)
        o_ref[:] = (r1 + mlp).reshape(group, seq, d_model).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "group", "eps", "interpret",
                     "deferred_div", "fast_exp"),
)
def fused_vit_block(
    x: jax.Array,            # (B, L, D) — PRE-LN residual stream
    ln1_scale: jax.Array, ln1_bias: jax.Array,
    wq: jax.Array, bq: jax.Array,
    wk: jax.Array, bk: jax.Array,
    wv: jax.Array, bv: jax.Array,
    wo: jax.Array, bo: jax.Array,
    ln2_scale: jax.Array, ln2_bias: jax.Array,
    w_fc: jax.Array, b_fc: jax.Array,
    w_proj: jax.Array, b_proj: jax.Array,
    num_heads: int,
    group: int = 4,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
    deferred_div: bool = False,
    fast_exp: bool = False,
) -> jax.Array:
    """Full pre-LN ViT encoder block (CLIP semantics, quickGELU) as one
    Pallas program. Returns x + Attn(LN1(x)) + MLP(LN2(x + Attn(LN1(x)))).
    Weight arguments must be bf16 (or will be cast); requires
    B % group == 0 and the whole group's scores + all block weights in
    VMEM — seq <= 128 at the default 16 MB scoped budget, or long
    sequences (ViT-L's 577, group=1, ~57 MB peak) under a raised limit
    (utils/tpu_flags.ensure_scoped_vmem_limit(98304)). ``deferred_div``
    rescales PV outputs instead of the score matrix (faster at long L,
    slower at short L). ``fast_exp`` computes the softmax exp in bf16
    with deferred division — the short-seq VPU lever (opt-in,
    fused_block_long='whole_fe')."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    assert batch % group == 0, (batch, group)
    head_dim = d_model // num_heads
    scale = head_dim ** -0.5
    d_ff = w_fc.shape[1]
    bf = jnp.bfloat16
    kernel = _make_vit_block_kernel(group, seq, num_heads, head_dim,
                                    scale, eps, x.dtype,
                                    deferred_div=deferred_div,
                                    fast_exp=fast_exp)
    xspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    mat = pl.BlockSpec((d_model, d_model), lambda i: (0, 0))
    vec = pl.BlockSpec((d_model,), lambda i: (0,))
    ff_vec = pl.BlockSpec((d_ff,), lambda i: (0,))
    return pl.pallas_call(
        kernel,
        grid=(batch // group,),
        in_specs=[
            xspec, vec, vec,
            mat, vec, mat, vec, mat, vec, mat, vec,
            vec, vec,
            pl.BlockSpec((d_model, d_ff), lambda i: (0, 0)), ff_vec,
            pl.BlockSpec((d_ff, d_model), lambda i: (0, 0)), vec,
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model), x.dtype),
        interpret=interpret,
    )(x, ln1_scale, ln1_bias,
      wq.astype(bf), bq, wk.astype(bf), bk, wv.astype(bf), bv,
      wo.astype(bf), bo, ln2_scale, ln2_bias,
      w_fc.astype(bf), b_fc, w_proj.astype(bf), b_proj)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "group", "interpret", "compute_dtype",
                     "block_diag"),
)
def fused_attention_block(
    x: jax.Array,        # (B, L, D) — post-LN activations
    wq: jax.Array, bq: jax.Array,
    wk: jax.Array, bk: jax.Array,
    wv: jax.Array, bv: jax.Array,
    wo: jax.Array, bo: jax.Array,
    num_heads: int,
    group: int = 16,
    interpret: Optional[bool] = None,
    compute_dtype: Any = jnp.float32,
    block_diag: bool = False,
) -> jax.Array:
    """Returns softmax((xWq)(xWk)^T/sqrt(dh))(xWv) Wo + bo, per head,
    shaped (B, L, D). Requires B % group == 0."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    assert batch % group == 0, (batch, group)
    head_dim = d_model // num_heads
    scale = head_dim ** -0.5

    if block_diag:
        kernel = _make_bd_kernel(group, seq, num_heads, head_dim, scale,
                                 x.dtype)
    else:
        kernel = _make_kernel(group, seq, num_heads, head_dim, scale,
                              x.dtype, compute_dtype=compute_dtype)
    grid = (batch // group,)
    mat = pl.BlockSpec((d_model, d_model), lambda i: (0, 0))
    vec = pl.BlockSpec((d_model,), lambda i: (0,))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0)),
            mat, vec, mat, vec, mat, vec, mat, vec,
        ],
        out_specs=pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model), x.dtype),
        interpret=interpret,
    )(x, wq, bq, wk, bk, wv, bv, wo, bo)


# ---------------------------------------------------------------------------
# int8 T5 encoder FFN (round 3): the opt-in bulk-eval throughput lever
# ---------------------------------------------------------------------------

def _group_quant_rows_i8(h: jax.Array, groups: int) -> list:
    """Per-(row, contraction-group) symmetric int8 quantization of an
    fp32 (rows, K) tile: K is split into ``groups`` static lane slices,
    each with its own per-row scale, so one outlier channel only costs
    resolution within its own group instead of the whole row. Returns
    [(int8 (rows, K/groups), f32 (rows, 1)) per group]; groups=1
    degenerates to _row_quant_i8."""
    kg = h.shape[-1] // groups
    return [_row_quant_i8(h[:, g * kg:(g + 1) * kg]) for g in range(groups)]


def _mm_q8_grouped(parts: list, w_ref, s_ref) -> jax.Array:
    """sum_g (hq_g @ W_g) * hs_g * s_g — the int8 matmul accumulated per
    contraction group in fp32. ``w_ref`` is the int8 (K, F) weight block,
    ``s_ref`` its f32 (G, F) per-(group, output-channel) dequant scales;
    the per-group int8 dots still run at the full MXU int8 rate (same
    total contraction depth), the extra cost is G-1 fp32 (rows, F) adds
    on the VPU."""
    groups = len(parts)
    kg = parts[0][0].shape[-1]
    acc = None
    for g, (hq, hs) in enumerate(parts):
        p = jax.lax.dot_general(
            hq, w_ref[g * kg:(g + 1) * kg, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        t = p.astype(jnp.float32) * hs * s_ref[g, :].astype(jnp.float32)
        acc = t if acc is None else acc + t
    return acc


def _make_t5_ffn_q8_kernel(group: int, seq: int, d_model: int, d_ff: int,
                           gated: bool, eps: float, out_dtype,
                           g_in: int, g_hid: int):
    """int8 twin of _make_t5_ffn_kernel: all two/three FFN matmuls run
    int8 on the MXU (measured 366 TOPS = 1.92x the bf16 rate on v5e).
    The per-row activation-quant passes stay in VMEM — in XLA they
    round-trip the (B, L, F) hidden through HBM and the win vanishes
    (measured neutral at ViT-L MLP shapes, PARITY.md). Weights are
    pre-quantized per (contraction-group, output-channel) — host-side,
    once, the LM is frozen; g_in/g_hid contraction groups (from the
    scale shapes) bound the blast radius of outlier channels on the
    per-row activation scales. int8 also HALVES the VMEM-resident
    weight footprint vs the bf16 fused kernel (~63 -> ~31 MB at T0-3B
    widths).

    Inference-only (no VJP): the eval path's frozen LM never needs
    gradients; training keeps the bf16 paths."""
    gl = group * seq

    def kernel(*refs):
        if gated:
            (x_ref, lnw_ref, w0_ref, s0_ref, w1_ref, s1_ref,
             wo_ref, so_ref, o_ref) = refs
        else:
            x_ref, lnw_ref, w0_ref, s0_ref, wo_ref, so_ref, o_ref = refs
            w1_ref = s1_ref = None
        x32 = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        # T5 RMS norm (no mean subtraction, scale only), fp32
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        h = x32 * jax.lax.rsqrt(var + eps) * lnw_ref[:].astype(jnp.float32)
        parts = _group_quant_rows_i8(h, g_in)  # one quant, used by wi_0+wi_1
        hid = _tanh_gelu(_mm_q8_grouped(parts, w0_ref, s0_ref))
        if gated:
            hid = hid * _mm_q8_grouped(parts, w1_ref, s1_ref)
        gparts = _group_quant_rows_i8(hid, g_hid)
        y = _mm_q8_grouped(gparts, wo_ref, so_ref)
        o_ref[:] = (x32 + y).reshape(group, seq, d_model).astype(out_dtype)

    return kernel


def _as_group_scales(s: jax.Array) -> jax.Array:
    """Accept legacy per-output-channel (F,) scales as 1 group."""
    return s.reshape(1, -1) if s.ndim == 1 else s


@functools.partial(jax.jit, static_argnames=("group", "eps", "interpret"))
def fused_t5_ffn_q8(
    x: jax.Array,                # (B, L, D) — PRE-NORM residual stream
    ln_weight: jax.Array,        # (D,) RMS-norm scale
    wi_0: jax.Array, s_0: jax.Array,     # int8 (D, F) + f32 (G, F) scales
    wi_1: Optional[jax.Array], s_1: Optional[jax.Array],  # gate or None
    wo: jax.Array, s_o: jax.Array,       # int8 (F, D) + f32 (G', D)
    group: int = 1,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x + FFN(RMSNorm(x)) with every matmul int8 on the MXU — the
    opt-in throughput mode for the FROZEN T0-3B encoder during bulk
    eval (the FFN is ~60% of encoder FLOPs; reference frozen-LM eval:
    /root/reference/src/models/vct0.py:396-491). Same scoped-VMEM note
    as fused_t5_ffn; int8 halves the resident-weight footprint.

    Scales may be (F,) (legacy, one scale over the full contraction) or
    (G, F) for G contraction groups (quantize_encoder_ffn's grouped
    scheme — reduces quantization drift at ~no cost; G must divide the
    contraction dim and wi_0/wi_1 must share G)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    assert batch % group == 0, (batch, group)
    d_ff = wi_0.shape[1]
    gated = wi_1 is not None
    s_0 = _as_group_scales(s_0)
    s_o = _as_group_scales(s_o)
    g_in, g_hid = s_0.shape[0], s_o.shape[0]
    assert d_model % g_in == 0 and d_ff % g_hid == 0, (g_in, g_hid)
    xspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    dvec = pl.BlockSpec((d_model,), lambda i: (0,))
    fsc = pl.BlockSpec((g_in, d_ff), lambda i: (0, 0))
    in_specs = [
        xspec, dvec,
        pl.BlockSpec((d_model, d_ff), lambda i: (0, 0)), fsc,
    ]
    args = [x, ln_weight, wi_0, s_0]
    if gated:
        s_1 = _as_group_scales(s_1)
        assert s_1.shape[0] == g_in, (s_1.shape, g_in)
        in_specs += [pl.BlockSpec((d_model, d_ff), lambda i: (0, 0)), fsc]
        args += [wi_1, s_1]
    in_specs += [
        pl.BlockSpec((d_ff, d_model), lambda i: (0, 0)),
        pl.BlockSpec((g_hid, d_model), lambda i: (0, 0)),
    ]
    args += [wo, s_o]
    return pl.pallas_call(
        _make_t5_ffn_q8_kernel(group, seq, d_model, d_ff, gated, eps,
                               x.dtype, g_in, g_hid),
        grid=(batch // group,),
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model), x.dtype),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# int8 T5 encoder attention projections (round 3): with the FFN already
# int8 (fused_t5_ffn_q8), the QKV/O projections are the next-largest
# MXU term (~34% of encoder FLOPs). Same split shape as the winning
# ViT-L "split3" path: norm+QKV in one program, O+residual in another,
# the bf16 attention core (t5_attention_core) between them.
# ---------------------------------------------------------------------------

def _make_t5_ln_qkv_q8_kernel(group: int, seq: int, d_model: int,
                              inner: int, eps: float, out_dtype,
                              g_in: int):
    gl = group * seq

    def kernel(x_ref, lnw_ref, wq_ref, sq_ref, wk_ref, sk_ref,
               wv_ref, sv_ref, q_ref, k_ref, v_ref):
        x32 = x_ref[:].reshape(gl, d_model).astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        h = x32 * jax.lax.rsqrt(var + eps) * lnw_ref[:].astype(jnp.float32)
        parts = _group_quant_rows_i8(h, g_in)   # one quant feeds all three
        for w_ref, s_ref, o_ref in ((wq_ref, sq_ref, q_ref),
                                    (wk_ref, sk_ref, k_ref),
                                    (wv_ref, sv_ref, v_ref)):
            out = _mm_q8_grouped(parts, w_ref, s_ref)
            o_ref[:] = out.reshape(group, seq, inner).astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("group", "eps", "interpret"))
def fused_t5_ln_qkv_q8(
    x: jax.Array,            # (B, L, D) — PRE-NORM residual stream
    ln_weight: jax.Array,    # (D,) RMS-norm scale
    wq: jax.Array, sq: jax.Array,   # int8 (D, inner) + f32 (G, inner)
    wk: jax.Array, sk: jax.Array,
    wv: jax.Array, sv: jax.Array,
    group: int = 1,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> tuple:
    """RMS-norm + the three T5 attention input projections, every matmul
    int8 on the MXU (T5 has no attention biases or query scaling).
    Returns (q, k, v) shaped (B, L, inner) in x.dtype, ready for
    t5_attention_core. Opt-in with cfg.int8_encoder_attn; inference-only.
    Scales may be (inner,) or (G, inner) contraction groups (all three
    must share G)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, d_model = x.shape
    assert batch % group == 0, (batch, group)
    inner = wq.shape[1]
    sq, sk, sv = (_as_group_scales(s) for s in (sq, sk, sv))
    g_in = sq.shape[0]
    assert sk.shape[0] == g_in and sv.shape[0] == g_in, (g_in, sk.shape,
                                                         sv.shape)
    assert d_model % g_in == 0, (d_model, g_in)
    xspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    ospec = pl.BlockSpec((group, seq, inner), lambda i: (i, 0, 0))
    mat = pl.BlockSpec((d_model, inner), lambda i: (0, 0))
    isc = pl.BlockSpec((g_in, inner), lambda i: (0, 0))
    out_sds = jax.ShapeDtypeStruct((batch, seq, inner), x.dtype)
    return pl.pallas_call(
        _make_t5_ln_qkv_q8_kernel(group, seq, d_model, inner,
                                  eps, x.dtype, g_in),
        grid=(batch // group,),
        in_specs=[
            xspec, pl.BlockSpec((d_model,), lambda i: (0,)),
            mat, isc, mat, isc, mat, isc,
        ],
        out_specs=(ospec, ospec, ospec),
        out_shape=(out_sds, out_sds, out_sds),
        interpret=interpret,
    )(x, ln_weight, wq, sq, wk, sk, wv, sv)


def _make_oproj_residual_q8_kernel(group: int, seq: int, inner: int,
                                   d_model: int, out_dtype, g_in: int):
    gl = group * seq

    def kernel(res_ref, attn_ref, wo_ref, so_ref, o_ref):
        a32 = attn_ref[:].reshape(gl, inner).astype(jnp.float32)
        parts = _group_quant_rows_i8(a32, g_in)
        y = _mm_q8_grouped(parts, wo_ref, so_ref)
        res = res_ref[:].reshape(gl, d_model).astype(jnp.float32)
        o_ref[:] = (res + y).reshape(group, seq, d_model).astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def fused_oproj_residual_q8(
    residual: jax.Array,     # (B, L, D) — the pre-attention stream
    attn: jax.Array,         # (B, L, inner) — attention core output
    wo: jax.Array, so: jax.Array,   # int8 (inner, D) + f32 (G, D)
    group: int = 1,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """residual + attn @ Wo with the matmul int8 on the MXU (the per-row
    activation quant stays in VMEM). Partner of fused_t5_ln_qkv_q8.
    Scales may be (D,) or (G, D) contraction groups."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq, inner = attn.shape
    assert batch % group == 0, (batch, group)
    d_model = wo.shape[1]
    so = _as_group_scales(so)
    g_in = so.shape[0]
    assert inner % g_in == 0, (inner, g_in)
    rspec = pl.BlockSpec((group, seq, d_model), lambda i: (i, 0, 0))
    aspec = pl.BlockSpec((group, seq, inner), lambda i: (i, 0, 0))
    return pl.pallas_call(
        _make_oproj_residual_q8_kernel(group, seq, inner, d_model,
                                       residual.dtype, g_in),
        grid=(batch // group,),
        in_specs=[
            rspec, aspec,
            pl.BlockSpec((inner, d_model), lambda i: (0, 0)),
            pl.BlockSpec((g_in, d_model), lambda i: (0, 0)),
        ],
        out_specs=rspec,
        out_shape=jax.ShapeDtypeStruct((batch, seq, d_model),
                                       residual.dtype),
        interpret=interpret,
    )(residual, attn, wo, so)
