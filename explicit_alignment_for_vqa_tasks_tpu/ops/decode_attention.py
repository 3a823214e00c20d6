"""Pallas decode-time cross-attention (single query token).

Trace-backed motivation (tools/decode_profile.py on the v5e, T0-3B,
B=16, 557-token encoder): the per-step cross-attention score and
weighted-value reads of the (layers, B, 557, 2048) K/V caches are 41% of
the 12.0 ms device step — XLA lowers the q-len-1 attention to kLoop
fusions running at ~380 GB/s. This kernel computes scores + softmax +
PV in ONE VMEM pass per (batch row, layer): K and V stream through VMEM
once at DMA rate and the (L, H) score matrix never touches HBM.

MXU formulation (a per-head VPU loop measured 1.3x SLOWER than XLA):
queries ride as a BLOCK-DIAGONAL matrix qb (D, H) — column h is q with
everything outside head h's 64-lane strip zeroed — so

    scores (L, H)   = K (L, D) @ qb (D, H)          one MXU matmul
    out_full (H, D) = P^T (H, L) @ V (L, D)         one MXU matmul
    out (1, D)      = sum_h out_full * sel (H, D)   diagonal-strip pick

where sel[h, d] = [d // head_dim == h]. The cross-head products are
exactly zero by construction, so this is bit-identical math with 32x
redundant FLOPs (146 MFLOP vs 4.6 MB DMA per (row, layer) — still
bandwidth-bound).

The layer index rides as a SCALAR-PREFETCH argument so the kernel block
maps directly into the full (layers, B, L, D) cache — no per-layer
dynamic-slice copy materializes (which a plain pallas_call inside the
layer scan would force).

T5 conventions: UNSCALED q, no position bias on cross-attention, key
mask as additive -1e9.

MEASURED RESULT (v5e, T0-3B, B=16, L=557, 20 decode steps): this kernel
LOSES to XLA — 16.3 ms/step vs 13.6 (a per-head VPU variant: 17.2).
480 pallas invocations per decode (24 layers x 20 steps) each pay
pipeline-fill + call overhead on a 9 MB stream, landing at ~230 GB/s
where XLA's kLoop gather fusion sustains ~380 GB/s. An int8 cross-KV
variant was also neutral (14.5 vs 14.2). Kept (default OFF,
``T5Config.fused_decode_attention``) as a correctness-tested record of
the attempt; see PARITY.md "Decode-step efficiency" for the full
trace-backed accounting.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(out_dtype, compute_dtype):
    def kernel(layer_ref, qb_ref, k_ref, v_ref, mask_ref, sel_ref, o_ref):
        del layer_ref  # consumed by the index maps
        key_bias = jnp.where(
            mask_ref[0, 0] > 0, 0.0, -1e9
        ).astype(jnp.float32)[:, None]                       # (L, 1)
        k = k_ref[0, 0].astype(compute_dtype)                # (L, D)
        v = v_ref[0, 0].astype(compute_dtype)                # (L, D)
        qb = qb_ref[0].astype(compute_dtype)                 # (D, H)
        s = jax.lax.dot_general(
            k, qb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + key_bias                                         # (L, H)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=0, keepdims=True)
        out_full = jax.lax.dot_general(
            p.astype(compute_dtype), v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (H, D)
        o_ref[0] = jnp.sum(
            out_full * sel_ref[:], axis=0, keepdims=True
        ).astype(out_dtype)                                  # (1, 1, D) blk

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_heads", "interpret")
)
def cross_attention_decode(
    q: jax.Array,        # (B, D) current-step cross queries, D = H*dh
    k_cache: jax.Array,  # (layers, B, L, D) — FULL stacked cache
    v_cache: jax.Array,  # (layers, B, L, D)
    mask: jax.Array,     # (B, L) encoder key-validity mask
    layer: jax.Array,    # () int32 — which layer's cache to read
    num_heads: int,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns (B, D) cross-attention output for one decode step."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_layers, batch, seq, d_model = k_cache.shape
    head_dim = d_model // num_heads
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    # attention probabilities in the cache dtype (bf16 on TPU) — matches
    # the XLA path, which casts softmax weights to the compute dtype
    compute_dtype = k_cache.dtype

    # sel[h, d] = 1 where d belongs to head h; qb = q spread block-diagonal
    sel = (
        jnp.arange(d_model)[None, :] // head_dim
        == jnp.arange(num_heads)[:, None]
    ).astype(jnp.float32)                                    # (H, D)
    qb = (q.astype(jnp.float32)[:, :, None]
          * sel.T[None])                                     # (B, D, H)
    mask3 = mask[:, None, :]                                 # (B, 1, L)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, d_model, num_heads),
                         lambda b, layer_ref: (b, 0, 0)),
            pl.BlockSpec(
                (1, 1, seq, d_model),
                lambda b, layer_ref: (layer_ref[0], b, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, seq, d_model),
                lambda b, layer_ref: (layer_ref[0], b, 0, 0),
            ),
            pl.BlockSpec((1, 1, seq), lambda b, layer_ref: (b, 0, 0)),
            pl.BlockSpec((num_heads, d_model),
                         lambda b, layer_ref: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, d_model), lambda b, layer_ref: (b, 0, 0)
        ),
    )
    out = pl.pallas_call(
        _make_kernel(q.dtype, compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, 1, d_model), q.dtype),
        interpret=interpret,
    )(layer_arr, qb, k_cache, v_cache, mask3, sel)
    return out[:, 0, :]
