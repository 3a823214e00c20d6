"""Autoregressive decoding loops (greedy, with per-token scores).

Replaces HF ``generate`` (reference: src/models/vct0.py:462-464) and the
reference's cache-less GPT-2 greedy loop (reference: src/models/
clipcap.py:344-471) with KV-cached ``lax.while_loop`` decode loops:
static shapes (pre-allocated (B, max_new_tokens) output buffers, one
compiled program per (batch, length) bucket) with an ALL-FINISHED early
exit — HF generate stops when every row has emitted EOS, and VQA answers
are typically 2-5 tokens against a 20-token budget, so exiting early
cuts real-data decode time several-fold. Outputs are bit-identical to
the fixed-count loop: steps after a row finishes would only have written
pad tokens with logprob 0, which is exactly the buffers' initial state.

Also returns per-token log-probabilities of the chosen tokens so the
ensemble scorer can reproduce the reference's sequence-scoring semantics
(summed log-probs skipping token ids {0,1,2},
reference: src/trainers/few_shot_vqa_executor.py:316-324).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import gpt2 as gpt2_lib
from ..models import t5 as t5_lib


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def greedy_decode_t5(
    params: Dict[str, Any],
    cfg: t5_lib.T5Config,
    encoder_hidden: jax.Array,     # (B, L, D)
    encoder_mask: jax.Array,       # (B, L)
    max_new_tokens: int = 20,
    force_eos_at: Any = None,      # optional (B,) int32 — bench hook
) -> Tuple[jax.Array, jax.Array]:
    """Greedy seq2seq decode from precomputed encoder states.

    Returns (tokens (B, T) int32, token_logprobs (B, T) f32). Rows stop at
    EOS; subsequent slots are pad with logprob 0. The loop exits as soon
    as every row has finished (see module docstring).

    ``force_eos_at`` (bench_generate.py --eos_at_steps): per-row step at
    which the row is force-finished, so the early-exit loop's cost can be
    measured under a REALISTIC answer-length distribution (random-init
    weights never emit EOS, so the default bench run pays the full
    budget). None — the production value — leaves the compiled graph
    untouched; when set, the only addition is one vector compare per
    step."""
    cache = t5_lib.init_decode_cache(params, cfg, encoder_hidden,
                                     max_new_tokens)
    return greedy_decode_from_cache(params, cfg, cache, encoder_mask,
                                    max_new_tokens, force_eos_at)


def greedy_decode_from_cache(
    params: Dict[str, Any],
    cfg: t5_lib.T5Config,
    cache: Dict[str, Any],
    encoder_mask: jax.Array,       # (B, L)
    max_new_tokens: int = 20,
    force_eos_at: Any = None,
) -> Tuple[jax.Array, jax.Array]:
    """``greedy_decode_t5``'s loop from a prebuilt decode cache
    (``t5.init_decode_cache`` or ``chunked_prefill_greedy_decode_t5``'s
    chunk-merged one)."""
    batch = encoder_mask.shape[0]

    buf = jnp.full((batch, max_new_tokens), cfg.pad_token_id, jnp.int32)
    lp_buf = jnp.zeros((batch, max_new_tokens), jnp.float32)
    start = jnp.full((batch,), cfg.decoder_start_token_id, dtype=jnp.int32)
    finished = jnp.zeros((batch,), dtype=bool)

    def cond(state):
        t, _, _, finished, _, _ = state
        return (t < max_new_tokens) & ~jnp.all(finished)

    def body(state):
        t, token, cache, finished, buf, lp_buf = state
        logits, cache = t5_lib.t5_decode_step(
            params, cfg, token, cache, encoder_mask
        )
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_token = jnp.where(finished, cfg.pad_token_id, next_token)
        token_lp = jnp.take_along_axis(
            log_probs, next_token[:, None], axis=-1
        )[:, 0]
        token_lp = jnp.where(finished, 0.0, token_lp)
        new_finished = finished | (next_token == cfg.eos_token_id)
        if force_eos_at is not None:
            new_finished = new_finished | (force_eos_at <= t + 1)
        return (t + 1, next_token, cache, new_finished,
                buf.at[:, t].set(next_token), lp_buf.at[:, t].set(token_lp))

    state = jax.lax.while_loop(
        cond, body, (jnp.int32(0), start, cache, finished, buf, lp_buf)
    )
    return state[4], state[5]


def encode_and_greedy_decode_t5(
    params: Dict[str, Any],
    cfg: t5_lib.T5Config,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    max_new_tokens: int = 20,
) -> Tuple[jax.Array, jax.Array]:
    """Encoder pass + greedy decode (the ``lm.generate(inputs_embeds=...)``
    surface of the reference)."""
    encoder_hidden = t5_lib.t5_encode(
        params, cfg, inputs_embeds=inputs_embeds,
        attention_mask=attention_mask,
    )
    return greedy_decode_t5(params, cfg, encoder_hidden, attention_mask,
                            max_new_tokens)


def chunked_prefill_greedy_decode_t5(
    params: Dict[str, Any],
    cfg: t5_lib.T5Config,
    inputs_embeds: jax.Array,      # (B, L, D)
    attention_mask: jax.Array,     # (B, L)
    max_new_tokens: int = 20,
    prefill_chunks: int = 2,
    force_eos_at: Any = None,
) -> Tuple[jax.Array, jax.Array]:
    """Encode + build the cross-KV cache in batch chunks, decode at full B.

    The decode-capacity wall (PARITY "Decode batch-capacity curve": OOM
    at B=112 with the full int8 stack) is a PREFILL-peak OOM — the
    encoder activations at B x L x d_model plus the fp32 quantization
    intermediates of ``cross_kv_cache`` peak while the persistent caches
    are only ~58.7 MB/row. Running the prefill as a ``lax.scan`` over
    ``prefill_chunks`` batch chunks shrinks that transient peak by
    ~chunks x while the decode loop still runs at the FULL batch, so
    the steady-state throughput point is unchanged.

    Value-equal to the unchunked path: the encoder and the per-row
    cross-KV quantization are row-independent (pinned in
    tests/test_chunked_prefill.py). The int8 storage layout is resolved
    from the FULL batch so the merged cache matches what
    ``t5_decode_step`` resolves at decode time."""
    batch = inputs_embeds.shape[0]
    if batch % prefill_chunks:
        raise ValueError(
            f"prefill_chunks={prefill_chunks} must divide batch={batch}"
        )
    b = batch // prefill_chunks
    emb = inputs_embeds.reshape((prefill_chunks, b)
                                + inputs_embeds.shape[1:])
    msk = attention_mask.reshape((prefill_chunks, b)
                                 + attention_mask.shape[1:])

    def chunk(carry, xm):
        e, m = xm
        hidden = t5_lib.t5_encode(
            params, cfg, inputs_embeds=e, attention_mask=m
        )
        return carry, t5_lib.cross_kv_cache(
            params, cfg, hidden, layout_batch=batch
        )

    _, stacked = jax.lax.scan(chunk, None, (emb, msk))
    # every cross leaf is (chunks, nl, b, *rest); chunks are contiguous
    # batch slices, so chunk-major merge restores row order
    cross = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x, 0, 1).reshape(
            (x.shape[1], batch) + x.shape[3:]
        ),
        stacked,
    )
    h, kv = cfg.num_heads, cfg.d_kv
    nl = cfg.num_decoder_layers
    cache = {
        "self_k": jnp.zeros((nl, batch, max_new_tokens, h, kv),
                            dtype=cfg.dtype),
        "self_v": jnp.zeros((nl, batch, max_new_tokens, h, kv),
                            dtype=cfg.dtype),
        "index": jnp.zeros((), dtype=jnp.int32),
        **cross,
    }
    return greedy_decode_from_cache(params, cfg, cache, attention_mask,
                                    max_new_tokens, force_eos_at)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def forced_decode_t5(
    params: Dict[str, Any],
    cfg: t5_lib.T5Config,
    encoder_hidden: jax.Array,
    encoder_mask: jax.Array,
    decoder_input_ids: jax.Array,   # (B, T0) forced prefix (incl. start)
    max_new_tokens: int = 20,
) -> Tuple[jax.Array, jax.Array]:
    """Teacher-force a decoder prefix, then continue greedily
    (the ``decoder_input_ids`` path, reference: vct0.py:466-482).
    Returns only the newly generated tokens."""
    batch, forced_len = decoder_input_ids.shape
    cache = t5_lib.init_decode_cache(
        params, cfg, encoder_hidden, forced_len + max_new_tokens
    )

    def forced_step(carry, token):
        cache, _ = carry
        logits, cache = t5_lib.t5_decode_step(
            params, cfg, token, cache, encoder_mask
        )
        return (cache, logits), None

    (cache, last_logits), _ = jax.lax.scan(
        forced_step,
        (cache, jnp.zeros((batch, cfg.vocab_size), dtype=jnp.float32)),
        decoder_input_ids.T,
    )

    buf = jnp.full((batch, max_new_tokens), cfg.pad_token_id, jnp.int32)
    lp_buf = jnp.zeros((batch, max_new_tokens), jnp.float32)

    def cond(state):
        t, _, _, finished, _, _ = state
        return (t < max_new_tokens) & ~jnp.all(finished)

    def body(state):
        t, logits, cache, finished, buf, lp_buf = state
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_token = jnp.where(finished, cfg.pad_token_id, next_token)
        token_lp = jnp.take_along_axis(
            log_probs, next_token[:, None], axis=-1
        )[:, 0]
        token_lp = jnp.where(finished, 0.0, token_lp)
        finished = finished | (next_token == cfg.eos_token_id)
        new_logits, cache = t5_lib.t5_decode_step(
            params, cfg, next_token, cache, encoder_mask
        )
        return (t + 1, new_logits, cache, finished,
                buf.at[:, t].set(next_token), lp_buf.at[:, t].set(token_lp))

    finished = jnp.zeros((batch,), dtype=bool)
    state = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), last_logits, cache, finished, buf, lp_buf),
    )
    return state[4], state[5]


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def greedy_decode_gpt2(
    params: Dict[str, Any],
    cfg: gpt2_lib.GPT2Config,
    inputs_embeds: jax.Array,       # (B, L, D) prompt incl. prefix + pos emb
    attention_mask: jax.Array,      # (B, L)
    max_new_tokens: int = 20,
    eos_token_id: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy decoder-only generation from embedded prompt
    (fixes the reference's cache-less loop, clipcap.py:414-419).

    Returns (tokens (B, T), token_logprobs (B, T))."""
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    batch, prompt_len, _ = inputs_embeds.shape
    max_len = prompt_len + max_new_tokens
    cache = gpt2_lib.init_gpt2_cache(cfg, batch, max_len)
    full_mask = jnp.concatenate(
        [attention_mask,
         jnp.ones((batch, max_new_tokens), dtype=attention_mask.dtype)],
        axis=1,
    )
    logits, cache = gpt2_lib.gpt2_prefill(
        params, cfg, inputs_embeds, attention_mask, cache
    )

    # post-finish slots hold EOS (GPT-2's pad == eos in the ClipCap
    # setup), so the buffer initializes to eos, not 0
    buf = jnp.full((batch, max_new_tokens), eos, jnp.int32)
    lp_buf = jnp.zeros((batch, max_new_tokens), jnp.float32)

    def cond(state):
        t, _, _, finished, _, _ = state
        return (t < max_new_tokens) & ~jnp.all(finished)

    def body(state):
        t, logits, cache, finished, buf, lp_buf = state
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_token = jnp.where(finished, eos, next_token)
        token_lp = jnp.take_along_axis(
            log_probs, next_token[:, None], axis=-1
        )[:, 0]
        token_lp = jnp.where(finished, 0.0, token_lp)
        finished = finished | (next_token == eos)
        new_logits, cache = gpt2_lib.gpt2_decode_step(
            params, cfg, next_token, cache, full_mask
        )
        return (t + 1, new_logits, cache, finished,
                buf.at[:, t].set(next_token), lp_buf.at[:, t].set(token_lp))

    finished = jnp.zeros((batch,), dtype=bool)
    state = jax.lax.while_loop(
        cond, body, (jnp.int32(0), logits, cache, finished, buf, lp_buf)
    )
    return state[4], state[5]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_beams", "max_new_tokens"),
)
def beam_search_t5(
    params: Dict[str, Any],
    cfg: t5_lib.T5Config,
    encoder_hidden: jax.Array,     # (B, L, D)
    encoder_mask: jax.Array,       # (B, L)
    num_beams: int = 3,
    max_new_tokens: int = 20,
    length_penalty: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Beam search over the KV-cached decoder (the reference exposes this
    via HF generate's ``num_beams``, configs' additional.num_beams).

    Up to ``max_new_tokens`` steps with an all-beams-finished early exit
    (finished beams emit pad at zero score cost, so post-finish steps
    only re-sort beams without changing the score/length/buffer
    association — the final pick is identical);
    final hypothesis = argmax of score / len**length_penalty. Returns
    (tokens (B, T), token_logprobs (B, T)) — the TRUE per-step chosen-token
    log-probabilities of the winning hypothesis, tracked through every beam
    reorder (pad emissions after finish carry logprob 0). This matches the
    greedy/forced decode surface, so ``sequence_scores`` composes correctly
    with beam outputs (the beam x ensemble combination).
    """
    batch, _, _ = encoder_hidden.shape
    K = num_beams
    V = cfg.vocab_size
    enc = jnp.repeat(encoder_hidden, K, axis=0)
    mask = jnp.repeat(encoder_mask, K, axis=0)
    cache = t5_lib.init_decode_cache(params, cfg, enc, max_new_tokens)

    start = jnp.full((batch * K,), cfg.decoder_start_token_id, jnp.int32)
    # only beam 0 is live initially so the first expansion yields K
    # DISTINCT continuations
    scores = jnp.tile(
        jnp.asarray([0.0] + [-1e9] * (K - 1), jnp.float32), batch
    )
    finished = jnp.zeros((batch * K,), dtype=bool)
    gen_len = jnp.zeros((batch * K,), dtype=jnp.int32)
    buf = jnp.zeros((batch * K, max_new_tokens), dtype=jnp.int32)
    lp_buf = jnp.zeros((batch * K, max_new_tokens), dtype=jnp.float32)

    def reorder(tree, flat_beam):
        # every cache leaf except the scalar step index has the (B*K)
        # batch at axis 1 — (layers, B*K, ...); this stays correct for
        # optional leaves like the int8 cross-KV scales
        return {
            key: (value if key == "index"
                  else jnp.take(value, flat_beam, axis=1))
            for key, value in tree.items()
        }

    def cond(state):
        t, _, _, _, finished, _, _, _ = state
        return (t < max_new_tokens) & ~jnp.all(finished)

    def body(state):
        t, last_token, cache, scores, finished, gen_len, buf, lp_buf = state
        logits, cache = t5_lib.t5_decode_step(
            params, cfg, last_token, cache, mask
        )
        logp = jax.nn.log_softmax(logits, axis=-1)      # (B*K, V)
        # finished beams may only emit pad, at no score cost
        pad_row = jnp.full((V,), -1e9).at[cfg.pad_token_id].set(0.0)
        logp = jnp.where(finished[:, None], pad_row[None], logp)
        total = (scores[:, None] + logp).reshape(batch, K * V)
        top_scores, top_idx = jax.lax.top_k(total, K)    # (B, K)
        beam_idx = top_idx // V
        token_idx = (top_idx % V).astype(jnp.int32)
        flat_beam = (
            jnp.arange(batch, dtype=jnp.int32)[:, None] * K + beam_idx
        ).reshape(-1)
        new_token = token_idx.reshape(-1)
        was_finished = finished[flat_beam]
        new_finished = was_finished | (new_token == cfg.eos_token_id)
        new_gen_len = gen_len[flat_beam] + (~was_finished).astype(jnp.int32)
        new_buf = jnp.take(buf, flat_beam, axis=0).at[:, t].set(new_token)
        # chosen-token logprob = new cumulative score - parent beam's score
        # (0 for pad emissions of finished beams, since pad_row scores 0)
        new_scores = top_scores.reshape(-1)
        token_lp = new_scores - scores[flat_beam]
        new_lp_buf = jnp.take(lp_buf, flat_beam, axis=0).at[:, t].set(
            token_lp
        )
        new_cache = reorder(cache, flat_beam)
        return (
            t + 1, new_token, new_cache, new_scores, new_finished,
            new_gen_len, new_buf, new_lp_buf,
        )

    state = (jnp.int32(0), start, cache, scores, finished, gen_len, buf,
             lp_buf)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, scores, _, gen_len, buf, lp_buf = state
    norm = scores / jnp.maximum(gen_len, 1).astype(jnp.float32) ** \
        length_penalty
    norm = norm.reshape(batch, K)
    best = jnp.argmax(norm, axis=1)
    buf = buf.reshape(batch, K, max_new_tokens)
    lp_buf = lp_buf.reshape(batch, K, max_new_tokens)
    tokens = jnp.take_along_axis(
        buf, best[:, None, None], axis=1
    )[:, 0]
    token_logprobs = jnp.take_along_axis(
        lp_buf, best[:, None, None], axis=1
    )[:, 0]
    return tokens, token_logprobs


def sequence_scores(
    tokens: jax.Array,        # (B, T)
    token_logprobs: jax.Array,  # (B, T)
    skip_token_ids: Tuple[int, ...] = (0, 1, 2),
) -> jax.Array:
    """Sum of generated-token log-probs, skipping special ids — the
    ensemble-member score (reference: few_shot_vqa_executor.py:316-324)."""
    skip = jnp.zeros_like(tokens, dtype=bool)
    for tid in skip_token_ids:
        skip = skip | (tokens == tid)
    return jnp.where(skip, 0.0, token_logprobs).sum(axis=-1)
