"""Pipeline parallelism (GPipe) over the scan-stacked T5 — beyond parity.

The reference has no model/pipeline parallelism at all (SURVEY §2.2; its
nearest mechanism is latent PL-DDP). This module adds a third mesh axis so
the frozen LM can outgrow one chip's HBM: a ``(data, pipe, model)`` mesh
where

* ``pipe``  — the stacked layer axis ``(L, ...)`` of the encoder/decoder
  param pytrees is sharded over stages. Microbatches flow stage-to-stage
  with ``lax.ppermute`` inside ``shard_map`` on a GPipe schedule (fill,
  steady state, drain: ``M + S - 1`` ticks for M microbatches / S stages).
* ``model`` — megatron tensor parallelism with explicit collectives
  (``shard_map`` makes them manual): q/k/v and wi_* split their OUTPUT
  dim (contiguous head groups / ffn columns), o and wo split their INPUT
  dim, and a single ``psum`` closes each attention/FFN block. The
  relative-position bias table shards over heads, consistent with the
  head-group weight split.
* ``data``  — each data shard runs an independent pipeline; the final
  token-weighted cross-entropy reduces with a ``psum`` over ``data``.

Everything is differentiable end-to-end: the microbatch loop is a
``lax.scan`` (reverse-mode transposable, unlike ``fori_loop``) and
``ppermute`` transposes to its inverse permutation — so mapper training
under ``jax.grad`` works through the pipeline (the LM itself stays frozen,
reference behavior: src/models/vct0.py:535-544).

The plain XLA attention path is used inside stages (the fused Pallas
kernel targets single-chip inference/training; under manual ``shard_map``
collectives the einsum formulation keeps the code auditable and lets XLA
overlap the psums with the next microbatch's compute).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from ..models import t5 as t5_lib
from ..models.t5 import (
    NEG_INF,
    T5Config,
    compute_position_bias,
    rms_norm,
    shift_right,
)

Params = Any

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"


def make_mesh_3d(n_devices: int, data: int, pipe: int, model: int,
                 devices: Optional[list] = None) -> Mesh:
    """A (data, pipe, model) mesh. Sizes must multiply to n_devices."""
    devices = devices if devices is not None else jax.devices()
    devices = devices[:n_devices]
    if data * pipe * model != len(devices):
        raise ValueError(
            f"mesh {data}x{pipe}x{model} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(data, pipe, model)
    return Mesh(arr, axis_names=(DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# Param partition specs for the pipelined LM
# ---------------------------------------------------------------------------

def pp_param_specs(params: Params) -> Params:
    """PartitionSpecs for the full T5 pytree under (data, pipe, model).

    Stacked per-layer leaves (leading dim = num_layers) shard over `pipe`;
    within a layer the megatron split applies over `model` (same recipe as
    mesh.py::t5_param_specs, but here consumed by shard_map, so the psums
    that close each block are written explicitly in the layer fns below).
    Embedding / lm_head / final layernorms replicate.
    """

    def spec_for(path: tuple, leaf: Any) -> P:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        key = names[-1] if names else ""
        if "ffn_q8" in names or "self_attn_q8" in names \
                or "step_q8" in names:
            # int8 weights + grouped dequant scales feed opaque
            # pallas_calls (fused_t5_ffn_q8 / fused_t5_ln_qkv_q8) or the
            # grouped decode-step matmuls (_matmul_w8). All q8 leaves are
            # scan-stacked with a leading layer axis: shard THAT over
            # `pipe` (the HBM win pipe exists for) and replicate over
            # `model` — a weight and its scales must shard identically,
            # the same invariant mesh.py::t5_param_specs keeps by full
            # replication on the 2-D mesh.
            nd = getattr(leaf, "ndim", 0)
            return P(PIPE_AXIS, *([None] * (nd - 1))) if nd >= 1 else P()
        if key == "rel_bias":            # (buckets, H)
            return P(None, MODEL_AXIS)
        if key in ("shared", "lm_head", "final_ln"):
            return P()
        stacked = getattr(leaf, "ndim", 0) == 3
        if key in ("q", "k", "v", "wi_0", "wi_1"):
            return P(PIPE_AXIS, None, MODEL_AXIS) if stacked else \
                P(None, MODEL_AXIS)
        if key in ("o", "wo"):
            return P(PIPE_AXIS, MODEL_AXIS, None) if stacked else \
                P(MODEL_AXIS, None)
        if key in ("ln0", "ln1", "ln2"):  # (layers, D)
            return P(PIPE_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_lm_params_pp(mesh: Mesh, params: Params) -> Params:
    from .mesh import put_host_array

    specs = pp_param_specs(params)
    return jax.tree.map(
        lambda x, s: put_host_array(mesh, s, x), params, specs
    )


# ---------------------------------------------------------------------------
# The GPipe schedule (runs INSIDE shard_map)
# ---------------------------------------------------------------------------

def gpipe(run_stage, x_mb: jax.Array, side_mb: Params, *,
          axis_name: str, n_stages: int, n_micro: int) -> jax.Array:
    """GPipe over one stack of layers.

    ``run_stage(x, side) -> y`` applies this stage's local layer shard.
    ``x_mb``   — (M, ...) microbatched activations (same array on every
                 stage; stage 0 is the only one that reads it as input).
    ``side_mb``— pytree of per-microbatch side inputs, leading dim M.
                 Each stage indexes the microbatch it is currently
                 processing (mb = t - stage), so side inputs never ride
                 the ppermute ring.

    Returns (M, ...) outputs of the LAST stage, broadcast to all stages
    (psum of a one-hot-by-stage selection). Bubble fraction is the usual
    (S-1)/(M+S-1); pick M >= S for reasonable efficiency.
    """
    S, M = n_stages, n_micro
    stage = jax.lax.axis_index(axis_name)

    def tick(carry, t):
        state, outputs = carry
        # Stage s processes microbatch (t - s); out-of-range ticks compute
        # garbage on clipped inputs that is never committed downstream.
        mb = jnp.clip(t - stage, 0, M - 1)
        x_in = jax.lax.dynamic_index_in_dim(x_mb, mb, 0, keepdims=False)
        x_cur = jnp.where(stage == 0, x_in, state)
        side = jax.tree.map(
            lambda s_: jax.lax.dynamic_index_in_dim(
                s_, mb, 0, keepdims=False),
            side_mb,
        )
        out = run_stage(x_cur, side)
        o_idx = t - (S - 1)
        commit = jnp.logical_and(
            stage == S - 1, jnp.logical_and(o_idx >= 0, o_idx < M)
        )
        o_clip = jnp.clip(o_idx, 0, M - 1)
        prev = jax.lax.dynamic_index_in_dim(outputs, o_clip, 0,
                                            keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(commit, out, prev), o_clip, 0
        )
        if S > 1:
            state = jax.lax.ppermute(
                out, axis_name, [(i, i + 1) for i in range(S - 1)]
            )
        else:
            state = out
        return (state, outputs), None

    init = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
    (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
    if S > 1:
        outputs = jax.lax.psum(
            jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs)),
            axis_name,
        )
    return outputs


# ---------------------------------------------------------------------------
# Per-stage layer bodies with explicit tp collectives
# ---------------------------------------------------------------------------

def _close_block(y: jax.Array, seq: bool, dtype) -> jax.Array:
    """Close a tp block: plain psum, or — with sequence parallelism — a
    psum_scatter over the query/sequence axis (same comm volume as the
    psum, but the result (and hence the residual stream, layernorms, and
    the inter-stage ppermute transfers) is 1/tp the size)."""
    if seq:
        y = jax.lax.psum_scatter(
            y, MODEL_AXIS, scatter_dimension=1, tiled=True
        )
    else:
        y = jax.lax.psum(y, MODEL_AXIS)
    return y.astype(dtype)


def _gather_seq(x: jax.Array, seq: bool) -> jax.Array:
    """Re-assemble the full sequence before a block's matmuls (sp only)."""
    if seq:
        return jax.lax.all_gather(x, MODEL_AXIS, axis=1, tiled=True)
    return x


def _attn_block_tp(layer_p: Params, x: jax.Array, kv_src: jax.Array,
                   bias: jax.Array, cfg: T5Config, heads_local: int,
                   seq: bool = False) -> jax.Array:
    """Local head-group attention; one collective over `model` closes the
    block (psum, or psum_scatter over queries under sequence parallelism).
    ``x``/``kv_src`` must be full-sequence (callers all-gather first)."""
    q = t5_lib._project(x, layer_p["q"], heads_local)
    k = t5_lib._project(kv_src, layer_p["k"], heads_local)
    v = t5_lib._project(kv_src, layer_p["v"], heads_local)
    out = t5_lib._attention(q, k, v, bias, x.dtype)
    out = out.reshape(out.shape[0], out.shape[1], -1)
    y = jnp.einsum(
        "ble,ed->bld", out, layer_p["o"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return _close_block(y, seq, x.dtype)


def _ffn_block_tp(layer_p: Params, x: jax.Array, cfg: T5Config,
                  seq: bool = False) -> jax.Array:
    hidden = jnp.einsum(
        "bld,df->blf", x, layer_p["wi_0"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    hidden = t5_lib.gelu_new(hidden)
    if cfg.is_gated_act:
        linear = jnp.einsum(
            "bld,df->blf", x, layer_p["wi_1"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        hidden = hidden * linear
    y = jnp.einsum(
        "blf,fd->bld", hidden, layer_p["wo"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return _close_block(y, seq, x.dtype)


def _encoder_layer(cfg: T5Config, heads_local: int, seq: bool = False,
                   tp: int = 1, q8_attn: bool = False, q8_ffn: bool = False,
                   pos_full: Optional[jax.Array] = None):
    """With ``seq`` the residual stream entering/leaving the layer is
    sequence-sharded over `model` (megatron sequence parallelism): the
    layernorms run on the local shard, the full sequence is all-gathered
    only for the attention/FFN matmuls, and psum_scatter re-shards.

    ``q8_attn``/``q8_ffn`` run the opt-in int8 encoder kernels INSIDE the
    GPipe stages (the same fused_t5_ln_qkv_q8 / t5_attention_core_vjp /
    fused_oproj_residual_q8 / fused_t5_ffn_q8 composition as the
    single-chip eval path, models/t5.py::t5_encode) so the int8
    throughput stack composes with pipe>1 instead of forcing a 2-D
    fallback. The q8 weights + scales ride pipe-sharded / model-
    replicated (pp_param_specs), so under tp>1 each model rank computes
    the q8 block on all heads — redundant FLOPs bounded by tp, accepted
    because the q8 subtrees' dequant scales cannot split a psum the way
    the bf16 megatron split can, and pipe (the memory axis) is where the
    int8 composition matters. The q8 FFN is pointwise over sequence, so
    under ``seq`` it runs directly on the local shard; q8 attention
    gathers the full sequence (it needs all keys) and re-shards after."""
    eps = cfg.layer_norm_epsilon

    def attn_part(x, side, layer_p):
        if q8_attn:
            from ..ops.fused_attention_block import (
                fused_oproj_residual_q8,
                fused_t5_ln_qkv_q8,
                t5_attention_core_vjp,
            )

            x_full = _gather_seq(x, seq)
            a8 = layer_p["self_attn_q8"]
            q, k, v = fused_t5_ln_qkv_q8(
                x_full, a8["ln"] if "ln" in a8 else layer_p["ln0"],
                a8["q"], a8["q_s"], a8["k"], a8["k_s"],
                a8["v"], a8["v_s"], eps=eps,
            )
            attn = t5_attention_core_vjp(
                q, k, v, pos_full, side["mask"], cfg.num_heads
            )
            y_full = fused_oproj_residual_q8(
                x_full, attn, a8["o"], a8["o_s"]
            )
            return _shard_seq(y_full, tp) if seq else y_full
        attn_in = _gather_seq(rms_norm(x, layer_p["ln0"], eps), seq)
        return x + _attn_block_tp(
            layer_p["self_attn"], attn_in, attn_in, side["bias"], cfg,
            heads_local, seq,
        )

    def ffn_part(y, layer_p):
        if q8_ffn:
            from ..ops.fused_attention_block import fused_t5_ffn_q8

            q8 = layer_p["ffn_q8"]
            gated = cfg.is_gated_act
            return fused_t5_ffn_q8(
                y, q8["ln"] if "ln" in q8 else layer_p["ln1"],
                q8["wi_0"], q8["wi_0_s"],
                q8["wi_1"] if gated else None,
                q8["wi_1_s"] if gated else None,
                q8["wo"], q8["wo_s"], eps=eps,
            )
        ffn_in = _gather_seq(rms_norm(y, layer_p["ln1"], eps), seq)
        return y + _ffn_block_tp(layer_p["ffn"], ffn_in, cfg, seq)

    def layer(x, side, layer_p):
        return ffn_part(attn_part(x, side, layer_p), layer_p)

    return layer


def _decoder_layer(cfg: T5Config, heads_local: int, seq: bool = False):
    eps = cfg.layer_norm_epsilon

    def layer(x, side, layer_p):
        sa_in = _gather_seq(rms_norm(x, layer_p["ln0"], eps), seq)
        y = x + _attn_block_tp(
            layer_p["self_attn"], sa_in, sa_in, side["self_bias"], cfg,
            heads_local, seq,
        )
        ca_in = _gather_seq(rms_norm(y, layer_p["ln1"], eps), seq)
        y = y + _attn_block_tp(
            layer_p["cross_attn"], ca_in, side["enc"], side["cross_bias"],
            cfg, heads_local, seq,
        )
        ffn_in = _gather_seq(rms_norm(y, layer_p["ln2"], eps), seq)
        return y + _ffn_block_tp(layer_p["ffn"], ffn_in, cfg, seq)

    return layer


def _shard_seq(x: jax.Array, tp: int) -> jax.Array:
    """Take this device's sequence shard (axis 1) by model-axis index."""
    if tp == 1:
        return x
    idx = jax.lax.axis_index(MODEL_AXIS)
    shard = x.shape[1] // tp
    return jax.lax.dynamic_slice_in_dim(x, idx * shard, shard, axis=1)


def _stage_runner(layer, stacked_local, remat: bool = False):
    """Scan this stage's local layer shard; with ``remat`` each layer is
    rematerialized in the backward pass (same lever as T5Config.remat on
    the single-chip path — trades recompute for not storing per-layer
    attention/FFN residuals across the GPipe schedule)."""

    def run(x, side):
        def body(c, p):
            return layer(c, side, p), None

        scanned = jax.checkpoint(body) if remat else body
        y, _ = jax.lax.scan(scanned, x, stacked_local)
        return y

    return run


def _microbatch(x: jax.Array, m: int) -> jax.Array:
    return x.reshape(m, x.shape[0] // m, *x.shape[1:])


def _encoder_pipeline(enc_p: Params, x: jax.Array, mask: jax.Array,
                      cfg: T5Config, heads_local: int, seq: bool,
                      n_micro: int, pp: int, tp: int) -> jax.Array:
    """The GPipe encoder stack incl. final layernorm — runs INSIDE
    shard_map. ``x`` is this data shard's (b_loc, L, D) embedded input;
    returns (b_loc, L, D) encoder hidden states (full sequence,
    replicated over `model` — each tp rank psums/all-gathers to the full
    activation)."""
    b_loc, length, _ = x.shape
    m = n_micro
    x = x.astype(cfg.dtype)
    q8_ffn = bool(cfg.int8_encoder_ffn) and "ffn_q8" in enc_p
    q8_attn = bool(cfg.int8_encoder_attn) and "self_attn_q8" in enc_p
    enc_stacked = {
        "self_attn": enc_p["self_attn"], "ffn": enc_p["ffn"],
        "ln0": enc_p["ln0"], "ln1": enc_p["ln1"],
    }
    side = {}
    pos_full = None
    if q8_attn:
        # the q8 attention path computes ALL heads per model rank
        # (q8 weights are model-replicated, see pp_param_specs), so it
        # needs the full-head position bias + the raw key mask (the
        # Pallas core folds the mask itself); rel_bias is model-sharded
        # for the bf16 tp path, so re-assemble it (tiny: buckets x H)
        rel = enc_p["rel_bias"]
        if tp > 1:
            rel = jax.lax.all_gather(rel, MODEL_AXIS, axis=1, tiled=True)
        pos_full = compute_position_bias(
            rel, length, length, bidirectional=True, cfg=cfg
        )[0]  # (H, L, L)
        side["mask"] = _microbatch(mask, m)
        enc_stacked["self_attn_q8"] = enc_p["self_attn_q8"]
    else:
        pos = compute_position_bias(
            enc_p["rel_bias"], length, length, bidirectional=True, cfg=cfg
        )  # (1, H_local, L, L)
        mask_bias = jnp.where(
            mask[:, None, None, :] > 0, 0.0, NEG_INF
        ).astype(jnp.float32)
        side["bias"] = _microbatch(pos + mask_bias, m)
    if q8_ffn:
        enc_stacked["ffn_q8"] = enc_p["ffn_q8"]
    run_enc = _stage_runner(
        _encoder_layer(cfg, heads_local, seq, tp=tp, q8_attn=q8_attn,
                       q8_ffn=q8_ffn, pos_full=pos_full),
        enc_stacked, remat=cfg.remat,
    )
    y_mb = gpipe(
        run_enc, _microbatch(_shard_seq(x, tp) if seq else x, m),
        side, axis_name=PIPE_AXIS, n_stages=pp, n_micro=m,
    )
    y_full = y_mb.reshape(b_loc, y_mb.shape[2], -1)
    if seq:
        y_full = jax.lax.all_gather(y_full, MODEL_AXIS, axis=1,
                                    tiled=True)
    return rms_norm(y_full, enc_p["final_ln"], cfg.layer_norm_epsilon)


# ---------------------------------------------------------------------------
# Pipelined seq2seq forward loss
# ---------------------------------------------------------------------------

def t5_forward_loss_pp(
    params: Params,
    cfg: T5Config,
    mesh: Mesh,
    labels: jax.Array,                  # (B, T) with -100 padding
    inputs_embeds: jax.Array,           # (B, L, D)
    attention_mask: Optional[jax.Array] = None,
    n_micro: int = 2,
    sequence_parallel: bool = False,
) -> jax.Array:
    """Pipelined twin of t5.t5_forward_loss (same math, 3-D parallel).

    Call under jit with `mesh` active. Requires: encoder AND decoder layer
    counts divisible by the pipe size, num_heads and d_ff divisible by the
    model size, per-data-shard batch divisible by n_micro. With
    ``sequence_parallel`` (and model > 1) the residual stream inside
    stages is sequence-sharded over `model` (encoder length and target
    length must then divide the model size).
    """
    dp = mesh.shape[DATA_AXIS]
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    seq = bool(sequence_parallel) and tp > 1
    if "q" not in params["decoder"]["self_attn"]:
        raise ValueError(
            "the bf16 decoder matmul weights were dropped by "
            "quantize_decoder_step(drop_bf16=True) — int8_decoder_step "
            "is an eval-only mode; the pipelined teacher-forced training "
            "loss needs the bf16 decoder (same contract as t5_decode)"
        )
    if cfg.num_encoder_layers % pp or cfg.num_decoder_layers % pp:
        raise ValueError(
            f"layers ({cfg.num_encoder_layers}/{cfg.num_decoder_layers}) "
            f"not divisible by pipe={pp}"
        )
    if cfg.num_heads % tp or cfg.d_ff % tp:
        raise ValueError(
            f"heads={cfg.num_heads} / d_ff={cfg.d_ff} not divisible by "
            f"model={tp}"
        )
    batch = labels.shape[0]
    if batch % (dp * n_micro):
        raise ValueError(
            f"batch={batch} not divisible by data({dp}) x n_micro({n_micro})"
        )
    heads_local = cfg.num_heads // tp
    enc_len = inputs_embeds.shape[1]
    if seq and (enc_len % tp or labels.shape[1] % tp):
        raise ValueError(
            f"sequence_parallel: enc_len={enc_len} / tgt_len="
            f"{labels.shape[1]} not divisible by model={tp}"
        )
    if attention_mask is None:
        attention_mask = jnp.ones((batch, enc_len), dtype=jnp.int32)

    def loss_fn(lm_params, x, labels, mask):
        enc_p, dec_p = lm_params["encoder"], lm_params["decoder"]
        b_loc, length, _ = x.shape
        m = n_micro
        x = x.astype(cfg.dtype)

        # ---- encoder pipeline ----
        enc_hidden = _encoder_pipeline(
            enc_p, x, mask, cfg, heads_local, seq, m, pp, tp
        )

        # ---- decoder pipeline ----
        dec_in = shift_right(labels, cfg)
        xd = lm_params["shared"].astype(cfg.dtype)[dec_in]
        qlen = xd.shape[1]
        causal = jnp.tril(jnp.ones((qlen, qlen), dtype=bool))
        self_bias = compute_position_bias(
            dec_p["rel_bias"], qlen, qlen, bidirectional=False, cfg=cfg
        ) + jnp.where(causal[None, None], 0.0, NEG_INF)
        self_bias = jnp.broadcast_to(
            self_bias, (b_loc, heads_local, qlen, qlen)
        )
        cross_bias = jnp.where(
            mask[:, None, None, :] > 0, 0.0, NEG_INF
        ).astype(jnp.float32)
        cross_bias = jnp.broadcast_to(
            cross_bias, (b_loc, heads_local, qlen, length)
        )
        dec_stacked = {
            "self_attn": dec_p["self_attn"],
            "cross_attn": dec_p["cross_attn"], "ffn": dec_p["ffn"],
            "ln0": dec_p["ln0"], "ln1": dec_p["ln1"], "ln2": dec_p["ln2"],
        }
        run_dec = _stage_runner(
            _decoder_layer(cfg, heads_local, seq), dec_stacked,
            remat=cfg.remat,
        )
        side_d = {
            "enc": _microbatch(enc_hidden, m),
            "self_bias": _microbatch(self_bias, m),
            "cross_bias": _microbatch(cross_bias, m),
        }
        yd_mb = gpipe(
            run_dec, _microbatch(_shard_seq(xd, tp) if seq else xd, m),
            side_d, axis_name=PIPE_AXIS, n_stages=pp, n_micro=m,
        )
        yd_full = yd_mb.reshape(b_loc, yd_mb.shape[2], -1)
        if seq:
            yd_full = jax.lax.all_gather(yd_full, MODEL_AXIS, axis=1,
                                         tiled=True)
        hidden = rms_norm(
            yd_full, dec_p["final_ln"], cfg.layer_norm_epsilon
        )

        # ---- logits + token-weighted CE, reduced over the data axis ----
        logits = t5_lib.lm_logits(lm_params, cfg, hidden)
        valid = labels != -100
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        num = jax.lax.psum((tll * valid).sum(), DATA_AXIS)
        den = jax.lax.psum(valid.sum(), DATA_AXIS)
        return -num / jnp.maximum(den, 1)

    specs = pp_param_specs(params)
    shmapped = _shard_map(
        loss_fn,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None, None), P(DATA_AXIS, None),
                  P(DATA_AXIS, None)),
        out_specs=P(),
        check_vma=False,
    )
    return shmapped(params, inputs_embeds, labels, attention_mask)


def vct0_caption_loss_pp(
    mapper_params: Params,
    lm_params: Params,
    cfg: Any,                       # VCT0Config
    mesh: Mesh,
    clip_embeddings: jax.Array,     # (B, prefix_size)
    labels: jax.Array,              # (B, T)
    n_micro: int = 2,
    sequence_parallel: bool = False,
) -> jax.Array:
    """Pipelined twin of vct0.vct0_caption_loss: mapper (replicated, tiny)
    projects the CLIP embedding into prefix token embeddings outside the
    shard_map; the frozen LM runs the 3-D-parallel pipeline."""
    from ..models.vct0 import mapper_apply

    if cfg.freeze_lm:
        lm_params = jax.tree.map(jax.lax.stop_gradient, lm_params)
    flat = mapper_apply(cfg.mapper, mapper_params, clip_embeddings)
    prefix_embeds = flat.reshape(
        -1, cfg.mapper.prefix_length, cfg.lm.d_model
    ).astype(cfg.lm.dtype)
    return t5_forward_loss_pp(
        lm_params, cfg.lm, mesh, labels, inputs_embeds=prefix_embeds,
        n_micro=n_micro, sequence_parallel=sequence_parallel,
    )


# ---------------------------------------------------------------------------
# Pipelined GENERATION (the eval side of the 3-D mesh)
#
# The flagship eval path (reference: src/models/vct0.py:396-491) under the
# (data, pipe, model) mesh: the ENCODER — the dominant cost at few-shot
# prompt lengths (PARITY.md: ~60% of the batch at B=32) — runs the same
# GPipe schedule as training, stage-sharded over `pipe` with megatron tp
# and optional sequence parallelism inside stages. The 20-step greedy
# DECODE then runs tensor-parallel only, with the decoder's pipe-sharded
# stacked-layer leaves gathered once per batch (`model`-axis splits are
# preserved): a T0-3B decoder is ~1.4 GB bf16 / pipe stage, so the
# transient gather is cheap next to the cross-KV cache, and the decode
# reuses the KV-cached single-chip loop under GSPMD instead of paying a
# per-token pipeline bubble.
# ---------------------------------------------------------------------------

def _check_pp_divisibility(cfg: T5Config, mesh: Mesh, batch: int,
                           enc_len: int, n_micro: int,
                           sequence_parallel: bool) -> tuple:
    dp = mesh.shape[DATA_AXIS]
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    seq = bool(sequence_parallel) and tp > 1
    if cfg.num_encoder_layers % pp:
        raise ValueError(
            f"encoder layers ({cfg.num_encoder_layers}) not divisible by "
            f"pipe={pp}"
        )
    if cfg.num_heads % tp or cfg.d_ff % tp:
        raise ValueError(
            f"heads={cfg.num_heads} / d_ff={cfg.d_ff} not divisible by "
            f"model={tp}"
        )
    if batch % (dp * n_micro):
        raise ValueError(
            f"batch={batch} not divisible by data({dp}) x n_micro({n_micro})"
        )
    if seq and enc_len % tp:
        raise ValueError(
            f"sequence_parallel: enc_len={enc_len} not divisible by "
            f"model={tp}"
        )
    return dp, pp, tp, seq


def t5_encode_pp(
    params: Params,                     # FULL LM pytree (pipe-sharded)
    cfg: T5Config,
    mesh: Mesh,
    inputs_embeds: jax.Array,           # (B, L, D)
    attention_mask: Optional[jax.Array] = None,
    n_micro: int = 2,
    sequence_parallel: bool = False,
) -> jax.Array:
    """Pipelined twin of t5.t5_encode (from embedded inputs): GPipe over
    `pipe`, megatron tp over `model`, independent pipelines per `data`
    shard. Returns (B, L, D) encoder hidden states sharded over `data`.

    Sequence parallelism shards the residual stream's length over
    `model`, so enc_len must divide tp; rather than hard-failing on the
    eval paths (whose spliced prompt lengths the user doesn't fully
    control), lengths are transparently right-padded with masked columns
    (masked keys are never attended to, so real positions are exact) and
    the hidden states sliced back."""
    batch, enc_len, _ = inputs_embeds.shape
    if attention_mask is None:
        attention_mask = jnp.ones((batch, enc_len), dtype=jnp.int32)
    tp_size = mesh.shape[MODEL_AXIS]
    pad_cols = 0
    if sequence_parallel and tp_size > 1 and enc_len % tp_size:
        pad_cols = tp_size - enc_len % tp_size
        inputs_embeds = jnp.pad(
            inputs_embeds, ((0, 0), (0, pad_cols), (0, 0))
        )
        attention_mask = jnp.pad(attention_mask, ((0, 0), (0, pad_cols)))
    padded_len = enc_len + pad_cols
    _, pp, tp, seq = _check_pp_divisibility(
        cfg, mesh, batch, padded_len, n_micro, sequence_parallel
    )
    heads_local = cfg.num_heads // tp

    def enc_fn(enc_p, x, mask):
        return _encoder_pipeline(
            enc_p, x, mask, cfg, heads_local, seq, n_micro, pp, tp
        )

    enc_specs = pp_param_specs({"encoder": params["encoder"]})["encoder"]
    shmapped = _shard_map(
        enc_fn,
        mesh=mesh,
        in_specs=(enc_specs, P(DATA_AXIS, None, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )
    hidden = shmapped(params["encoder"], inputs_embeds, attention_mask)
    return hidden[:, :enc_len] if pad_cols else hidden


def gather_decoder_over_pipe(params: Params, mesh: Mesh) -> Params:
    """Re-constrain the decoder subtree so its pipe-sharded stacked-layer
    leaves are gathered over `pipe` while keeping the `model`-axis
    megatron splits. Under jit this lowers to one all-gather per leaf;
    encoder leaves are untouched (and DCE'd by decode-only programs)."""
    from jax.sharding import NamedSharding

    specs = pp_param_specs({"decoder": params["decoder"]})["decoder"]

    def drop_pipe(spec: P) -> P:
        return P(*[None if ax == PIPE_AXIS else ax for ax in spec])

    dec = jax.tree.map(
        lambda x, s: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, drop_pipe(s))
        ),
        params["decoder"], specs,
    )
    return {**params, "decoder": dec}


def encode_and_gather_pp(
    params: Params,
    cfg: T5Config,
    mesh: Mesh,
    inputs_embeds: jax.Array,           # (B, L, D)
    attention_mask: jax.Array,          # (B, L)
    n_micro: int,
    sequence_parallel: bool,
):
    """The shared eval-twin composition: GPipe-pipelined encoder pass +
    decoder params gathered over `pipe` (kept tp-split). Every pipelined
    generate flavor decodes from this pair."""
    hidden = t5_encode_pp(
        params, cfg, mesh, inputs_embeds, attention_mask,
        n_micro=n_micro, sequence_parallel=sequence_parallel,
    )
    return hidden, gather_decoder_over_pipe(params, mesh)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "max_new_tokens", "n_micro",
                     "sequence_parallel"),
)
def greedy_generate_pp(
    params: Params,
    cfg: T5Config,
    mesh: Mesh,
    inputs_embeds: jax.Array,           # (B, L, D)
    attention_mask: jax.Array,          # (B, L)
    max_new_tokens: int = 20,
    n_micro: int = 2,
    sequence_parallel: bool = False,
):
    """Pipelined encoder + tp-sharded KV-cached greedy decode.

    The pipelined eval twin of ops.decoding.encode_and_greedy_decode_t5;
    returns (tokens (B, T), token_logprobs (B, T)) like the single-chip
    path (equivalence pinned in tests/test_executor_mesh.py)."""
    from ..ops.decoding import greedy_decode_t5

    hidden, gathered = encode_and_gather_pp(
        params, cfg, mesh, inputs_embeds, attention_mask,
        n_micro, sequence_parallel,
    )
    return greedy_decode_t5(
        gathered, cfg, hidden, attention_mask, max_new_tokens
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "max_new_tokens", "n_micro",
                     "sequence_parallel"),
)
def forced_generate_pp(
    params: Params,
    cfg: T5Config,
    mesh: Mesh,
    inputs_embeds: jax.Array,           # (B, L, D)
    attention_mask: jax.Array,          # (B, L)
    decoder_input_ids: jax.Array,       # (B, T0) forced prefix
    max_new_tokens: int = 20,
    n_micro: int = 2,
    sequence_parallel: bool = False,
):
    """Pipelined twin of the forced-decoder-prefix path: GPipe encoder,
    then ops.decoding.forced_decode_t5 on pipe-gathered decoder params
    (reference surface: vct0.py:466-482)."""
    from ..ops.decoding import forced_decode_t5

    hidden, gathered = encode_and_gather_pp(
        params, cfg, mesh, inputs_embeds, attention_mask,
        n_micro, sequence_parallel,
    )
    return forced_decode_t5(
        gathered, cfg, hidden, attention_mask, decoder_input_ids,
        max_new_tokens,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "num_beams", "max_new_tokens",
                     "n_micro", "sequence_parallel"),
)
def beam_generate_pp(
    params: Params,
    cfg: T5Config,
    mesh: Mesh,
    inputs_embeds: jax.Array,           # (B, L, D)
    attention_mask: jax.Array,          # (B, L)
    num_beams: int,
    max_new_tokens: int = 20,
    n_micro: int = 2,
    sequence_parallel: bool = False,
):
    """Pipelined twin of beam search: GPipe encoder, then
    ops.decoding.beam_search_t5 on pipe-gathered decoder params. Returns
    the same (tokens, true per-token logprobs) surface as the
    single-device path, so sequence_scores composes identically."""
    from ..ops.decoding import beam_search_t5

    hidden, gathered = encode_and_gather_pp(
        params, cfg, mesh, inputs_embeds, attention_mask,
        n_micro, sequence_parallel,
    )
    return beam_search_t5(
        gathered, cfg, hidden, attention_mask, num_beams=num_beams,
        max_new_tokens=max_new_tokens,
    )
