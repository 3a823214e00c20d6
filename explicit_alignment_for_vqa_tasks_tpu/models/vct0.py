"""VC-T0: frozen T5/T0 LM + trainable mapping network + prefix splicing.

The flagship model family (reference: src/models/vct0.py:301-544).
Capabilities reproduced TPU-natively:

  * ``forward``/``caption_loss``: prefix-only captioning loss over the
    frozen LM (reference: vct0.py:380-394) — the mapping-network training
    objective;
  * ``generate`` paths (reference: vct0.py:396-491):
      - main: embed prompt, project prefixes, splice at sentinels, encode
        once, greedy-decode with KV cache;
      - ``no_prefix``: text-only prompt;
      - ``pass_examples_through_encoder_one_at_a_time``: encode each shot
        separately (per-shot sentinel <extra_id_i>), concatenate encoder
        states for the decoder — the blockwise-encoder long-context mode;
      - forced ``decoder_input_ids`` prefix;
      - prefix-only captioning generation.

Everything device-side is jit-compiled with static shapes; the frozen LM
params are stop-gradiented inside the loss so only the mapper trains.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import decoding as _decoding
from ..ops.prefix_splice import T5_SENTINEL_BASE, insert_prefix_into_input
from ..registry import MODELS
from . import t5 as t5_lib
from .mappers import MapperConfig, init_mapper, mapper_apply

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VCT0Config:
    lm: t5_lib.T5Config
    mapper: MapperConfig
    freeze_lm: bool = True
    # id of <extra_id_0>; <extra_id_i> = sentinel_base - i. 32099 for the
    # real T5/T0 vocabulary; tokenizers with other vocab sizes (e.g. the
    # tiny committed sentencepiece-style fixture) override this.
    sentinel_base: int = T5_SENTINEL_BASE

    @property
    def prefix_length(self) -> int:
        return self.mapper.prefix_length

    @classmethod
    def from_model_args(cls, model_args: Dict[str, Any],
                        lm_cfg: Optional[t5_lib.T5Config] = None,
                        freeze_lm: bool = True) -> "VCT0Config":
        """Build from the config-file ``model_config.model_args`` schema
        (prefix_length / prefix_size / mapping_type / model_version)."""
        lm = lm_cfg if lm_cfg is not None else t5_lib.T5Config.t0_3b()
        mapper = MapperConfig(
            mapping_type=model_args.get("mapping_type", "mlp"),
            prefix_size=model_args.get("prefix_size", 768),
            d_model=lm.d_model,
            prefix_length=model_args.get("prefix_length", 10),
            clip_length=model_args.get(
                "clip_length", model_args.get("prefix_length", 10)
            ),
            num_layers=model_args.get("num_layers", 8),
        )
        return cls(
            lm=lm, mapper=mapper, freeze_lm=freeze_lm,
            sentinel_base=model_args.get("sentinel_base", T5_SENTINEL_BASE),
        )


def init_vct0_params(
    key: jax.Array, cfg: VCT0Config, lm_params: Optional[Params] = None,
    param_dtype: Any = jnp.bfloat16,
) -> Params:
    k_lm, k_map = jax.random.split(key)
    if lm_params is None:
        lm_params = t5_lib.init_t5_params(k_lm, cfg.lm, param_dtype)
    latents_init = None
    if cfg.mapper.mapping_type == "perceiver":
        # perceiver latents initialized from sampled vocab embeddings
        # (reference: vct0.py:333-346,359-362)
        idx = jax.random.randint(
            k_map, (cfg.mapper.prefix_length,), 0, cfg.lm.vocab_size
        )
        latents_init = jnp.asarray(lm_params["shared"])[idx].astype(
            jnp.float32
        )
    mapper_params = init_mapper(k_map, cfg.mapper, latents_init=latents_init)
    return {"lm": lm_params, "mapper": mapper_params}


def project_prefix(
    cfg: VCT0Config, mapper_params: Params, prefix: jax.Array
) -> jax.Array:
    """(B, P, prefix_size) -> (B, P, prefix_length, d_model)."""
    flat = mapper_apply(cfg.mapper, mapper_params, prefix)
    return flat.reshape(
        *prefix.shape[:-1], cfg.mapper.prefix_length, cfg.lm.d_model
    )


# ---------------------------------------------------------------------------
# Training: captioning loss (prefix-only)
# ---------------------------------------------------------------------------

def vct0_caption_loss(
    mapper_params: Params,
    lm_params: Params,
    cfg: VCT0Config,
    clip_embeddings: jax.Array,   # (B, prefix_size)
    labels: jax.Array,            # (B, T) with -100 padding
) -> jax.Array:
    """Captioning loss with the visual prefix as the entire encoder input
    (reference: vct0.py:380-394)."""
    if cfg.freeze_lm:
        lm_params = jax.tree.map(jax.lax.stop_gradient, lm_params)
    flat = mapper_apply(cfg.mapper, mapper_params, clip_embeddings)
    prefix_embeds = flat.reshape(
        -1, cfg.mapper.prefix_length, cfg.lm.d_model
    ).astype(cfg.lm.dtype)
    return t5_lib.t5_forward_loss(
        lm_params, cfg.lm, labels, inputs_embeds=prefix_embeds
    )


# ---------------------------------------------------------------------------
# Generation — jitted compute units (one compiled program per shape bucket)
# ---------------------------------------------------------------------------

import functools  # noqa: E402


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_prefixes", "max_new_tokens", "num_beams",
                     "prefill_chunks"),
)
def _generate_main(
    lm_params: Params, mapper_params: Params, cfg: VCT0Config,
    prefix: jax.Array, tokens: jax.Array, mask: jax.Array,
    num_prefixes: int, max_new_tokens: int, num_beams: int = 1,
    force_eos_at: Optional[jax.Array] = None, prefill_chunks: int = 1,
):
    text_embeds = t5_lib.embed_tokens(lm_params, cfg.lm, tokens)
    prefix_proj = project_prefix(cfg, mapper_params, prefix)
    joint, joint_mask = insert_prefix_into_input(
        tokens, text_embeds, prefix_proj.astype(text_embeds.dtype), mask,
        prefix_length=cfg.prefix_length, num_prefixes=num_prefixes,
        base_id=cfg.sentinel_base,
    )
    if prefill_chunks > 1:
        if num_beams > 1:
            raise ValueError(
                "prefill_chunks > 1 is greedy-only (beam search expands "
                "the batch before the cache is built)"
            )
        # encode + quantize the cross-KV in batch chunks to cut the
        # prefill activation peak; decode at full B (the B>=112 capacity
        # lever, value-equal — see chunked_prefill_greedy_decode_t5)
        return _decoding.chunked_prefill_greedy_decode_t5(
            lm_params, cfg.lm, joint, joint_mask, max_new_tokens,
            prefill_chunks=prefill_chunks, force_eos_at=force_eos_at,
        )
    hidden = t5_lib.t5_encode(
        lm_params, cfg.lm, inputs_embeds=joint, attention_mask=joint_mask
    )
    if num_beams > 1:
        # returns true per-token logprobs of the winning hypothesis, so
        # sequence_scores composes with beam outputs like with greedy
        return _decoding.beam_search_t5(
            lm_params, cfg.lm, hidden, joint_mask,
            num_beams=num_beams, max_new_tokens=max_new_tokens,
        )
    return _decoding.greedy_decode_t5(lm_params, cfg.lm, hidden, joint_mask,
                            max_new_tokens, force_eos_at=force_eos_at)


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new_tokens", "num_beams")
)
def _generate_no_prefix(
    lm_params: Params, cfg: VCT0Config, tokens: jax.Array, mask: jax.Array,
    max_new_tokens: int, num_beams: int = 1,
):
    hidden = t5_lib.t5_encode(
        lm_params, cfg.lm, input_ids=tokens, attention_mask=mask
    )
    if num_beams > 1:
        return _decoding.beam_search_t5(
            lm_params, cfg.lm, hidden, mask,
            num_beams=num_beams, max_new_tokens=max_new_tokens,
        )
    return _decoding.greedy_decode_t5(lm_params, cfg.lm, hidden, mask, max_new_tokens)


# --- pipelined twins (3-D (data, pipe, model) mesh; eval side) ----------

@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "num_prefixes", "max_new_tokens",
                     "n_micro", "sequence_parallel", "num_beams"),
)
def _generate_main_pp(
    lm_params: Params, mapper_params: Params, cfg: VCT0Config, mesh,
    prefix: jax.Array, tokens: jax.Array, mask: jax.Array,
    num_prefixes: int, max_new_tokens: int, n_micro: int,
    sequence_parallel: bool, num_beams: int = 1,
):
    """Pipelined twin of _generate_main: GPipe encoder over `pipe`,
    tp decode (greedy or beam) with pipe-gathered decoder params
    (parallel/pipeline.py::greedy_generate_pp / beam_generate_pp)."""
    from ..parallel.pipeline import beam_generate_pp, greedy_generate_pp

    text_embeds = t5_lib.embed_tokens(lm_params, cfg.lm, tokens)
    prefix_proj = project_prefix(cfg, mapper_params, prefix)
    joint, joint_mask = insert_prefix_into_input(
        tokens, text_embeds, prefix_proj.astype(text_embeds.dtype), mask,
        prefix_length=cfg.prefix_length, num_prefixes=num_prefixes,
        base_id=cfg.sentinel_base,
    )
    if num_beams > 1:
        return beam_generate_pp(
            lm_params, cfg.lm, mesh, joint, joint_mask,
            num_beams=num_beams, max_new_tokens=max_new_tokens,
            n_micro=n_micro, sequence_parallel=sequence_parallel,
        )
    return greedy_generate_pp(
        lm_params, cfg.lm, mesh, joint, joint_mask,
        max_new_tokens=max_new_tokens, n_micro=n_micro,
        sequence_parallel=sequence_parallel,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "max_new_tokens", "n_micro",
                     "sequence_parallel", "num_beams"),
)
def _generate_no_prefix_pp(
    lm_params: Params, cfg: VCT0Config, mesh, tokens: jax.Array,
    mask: jax.Array, max_new_tokens: int, n_micro: int,
    sequence_parallel: bool, num_beams: int = 1,
):
    from ..parallel.pipeline import beam_generate_pp, greedy_generate_pp

    embeds = t5_lib.embed_tokens(lm_params, cfg.lm, tokens)
    if num_beams > 1:
        return beam_generate_pp(
            lm_params, cfg.lm, mesh, embeds, mask, num_beams=num_beams,
            max_new_tokens=max_new_tokens, n_micro=n_micro,
            sequence_parallel=sequence_parallel,
        )
    return greedy_generate_pp(
        lm_params, cfg.lm, mesh, embeds, mask,
        max_new_tokens=max_new_tokens, n_micro=n_micro,
        sequence_parallel=sequence_parallel,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "max_new_tokens", "n_micro",
                     "sequence_parallel"),
)
def _generate_prefix_only_pp(
    lm_params: Params, mapper_params: Params, cfg: VCT0Config, mesh,
    prefix: jax.Array, max_new_tokens: int, n_micro: int,
    sequence_parallel: bool,
):
    from ..parallel.pipeline import greedy_generate_pp

    prefix_proj = project_prefix(cfg, mapper_params, prefix)
    prefix_embeds = prefix_proj.reshape(
        prefix.shape[0], -1, cfg.lm.d_model
    ).astype(cfg.lm.dtype)
    mask = jnp.ones(prefix_embeds.shape[:2], dtype=jnp.int32)
    return greedy_generate_pp(
        lm_params, cfg.lm, mesh, prefix_embeds, mask,
        max_new_tokens=max_new_tokens, n_micro=n_micro,
        sequence_parallel=sequence_parallel,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def _generate_prefix_only(
    lm_params: Params, mapper_params: Params, cfg: VCT0Config,
    prefix: jax.Array, max_new_tokens: int,
):
    prefix_proj = project_prefix(cfg, mapper_params, prefix)
    prefix_embeds = prefix_proj.reshape(
        prefix.shape[0], -1, cfg.lm.d_model
    ).astype(cfg.lm.dtype)
    mask = jnp.ones(prefix_embeds.shape[:2], dtype=jnp.int32)
    hidden = t5_lib.t5_encode(
        lm_params, cfg.lm, inputs_embeds=prefix_embeds, attention_mask=mask
    )
    return _decoding.greedy_decode_t5(lm_params, cfg.lm, hidden, mask, max_new_tokens)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def _generate_forced(
    lm_params: Params, mapper_params: Params, cfg: VCT0Config,
    prefix: jax.Array, tokens: jax.Array, mask: jax.Array,
    decoder_input_ids: jax.Array, max_new_tokens: int,
):
    text_embeds = t5_lib.embed_tokens(lm_params, cfg.lm, tokens)
    prefix_proj = project_prefix(cfg, mapper_params, prefix)
    joint, joint_mask = insert_prefix_into_input(
        tokens, text_embeds, prefix_proj[:, -1:].astype(text_embeds.dtype),
        mask, prefix_length=cfg.prefix_length, num_prefixes=1,
        base_id=cfg.sentinel_base,
    )
    hidden = t5_lib.t5_encode(
        lm_params, cfg.lm, inputs_embeds=joint, attention_mask=joint_mask
    )
    return _decoding.forced_decode_t5(
        lm_params, cfg.lm, hidden, joint_mask, decoder_input_ids,
        max_new_tokens,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "max_new_tokens", "n_micro",
                     "sequence_parallel"),
)
def _generate_forced_pp(
    lm_params: Params, mapper_params: Params, cfg: VCT0Config, mesh,
    prefix: jax.Array, tokens: jax.Array, mask: jax.Array,
    decoder_input_ids: jax.Array, max_new_tokens: int, n_micro: int,
    sequence_parallel: bool,
):
    """Pipelined twin of _generate_forced (reference: vct0.py:466-482):
    same test-image-only splice, GPipe encoder, teacher-forced decode on
    pipe-gathered decoder params."""
    from ..parallel.pipeline import forced_generate_pp

    text_embeds = t5_lib.embed_tokens(lm_params, cfg.lm, tokens)
    prefix_proj = project_prefix(cfg, mapper_params, prefix)
    joint, joint_mask = insert_prefix_into_input(
        tokens, text_embeds, prefix_proj[:, -1:].astype(text_embeds.dtype),
        mask, prefix_length=cfg.prefix_length, num_prefixes=1,
        base_id=cfg.sentinel_base,
    )
    return forced_generate_pp(
        lm_params, cfg.lm, mesh, joint, joint_mask, decoder_input_ids,
        max_new_tokens=max_new_tokens, n_micro=n_micro,
        sequence_parallel=sequence_parallel,
    )


def _one_at_a_time_segments(
    lm_params: Params, mapper_params: Params, cfg: VCT0Config,
    prefix: Optional[jax.Array], tokens: jax.Array, mask: jax.Array,
    num_segments: int, with_prefix: bool,
):
    """Per-segment spliced encoder inputs for the blockwise-encoder mode
    (reference: vct0.py:427-444). Segment i's sentinel is <extra_id_i>.
    Yields (inputs_embeds | input_ids, mask) per segment."""
    prefix_proj = (
        project_prefix(cfg, mapper_params, prefix) if with_prefix else None
    )
    for i in range(num_segments):
        seg_tokens, seg_mask = tokens[:, i], mask[:, i]
        if with_prefix:
            text_embeds = t5_lib.embed_tokens(lm_params, cfg.lm, seg_tokens)
            joint, joint_mask = insert_prefix_into_input(
                seg_tokens, text_embeds,
                prefix_proj[:, i:i + 1].astype(text_embeds.dtype), seg_mask,
                prefix_length=cfg.prefix_length, num_prefixes=1,
                base_id=cfg.sentinel_base - i,
            )
            yield joint, joint_mask
        else:
            yield seg_tokens, seg_mask


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_segments", "max_new_tokens",
                              "with_prefix", "num_beams")
)
def _generate_one_at_a_time(
    lm_params: Params, mapper_params: Params, cfg: VCT0Config,
    prefix: Optional[jax.Array], tokens: jax.Array, mask: jax.Array,
    num_segments: int, max_new_tokens: int, with_prefix: bool,
    num_beams: int = 1,
):
    """Blockwise encoder (reference: vct0.py:427-444): segments are
    encoded independently and their states concatenated for the decoder.
    The reference loops S separate encoder passes; segments share one
    static shape, so they stack along the BATCH axis into ONE encode
    (identical math — encoder rows are independent — and one big batch
    keeps the MXU fed at small B). num_beams rides through to the decode
    like HF generate's."""
    seg_inputs, seg_masks = [], []
    for seg_in, seg_mask in _one_at_a_time_segments(
        lm_params, mapper_params, cfg, prefix, tokens, mask,
        num_segments, with_prefix,
    ):
        if not with_prefix:
            seg_in = t5_lib.embed_tokens(lm_params, cfg.lm, seg_in)
        seg_inputs.append(seg_in)
        seg_masks.append(seg_mask)
    stacked = jnp.concatenate(seg_inputs, axis=0)      # (S*B, L, D)
    stacked_mask = jnp.concatenate(seg_masks, axis=0)
    hidden = t5_lib.t5_encode(
        lm_params, cfg.lm, inputs_embeds=stacked,
        attention_mask=stacked_mask,
    )
    batch = tokens.shape[0]
    seg_len = hidden.shape[1]
    encoder_hidden = hidden.reshape(
        num_segments, batch, seg_len, -1
    ).transpose(1, 0, 2, 3).reshape(batch, num_segments * seg_len, -1)
    encoder_mask = stacked_mask.reshape(
        num_segments, batch, seg_len
    ).transpose(1, 0, 2).reshape(batch, num_segments * seg_len)
    if num_beams > 1:
        return _decoding.beam_search_t5(
            lm_params, cfg.lm, encoder_hidden, encoder_mask,
            num_beams=num_beams, max_new_tokens=max_new_tokens,
        )
    return _decoding.greedy_decode_t5(
        lm_params, cfg.lm, encoder_hidden, encoder_mask, max_new_tokens
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "num_segments", "max_new_tokens",
                     "with_prefix", "n_micro", "sequence_parallel",
                     "num_beams"),
)
def _generate_one_at_a_time_pp(
    lm_params: Params, mapper_params: Params, cfg: VCT0Config, mesh,
    prefix: Optional[jax.Array], tokens: jax.Array, mask: jax.Array,
    num_segments: int, max_new_tokens: int, with_prefix: bool,
    n_micro: int, sequence_parallel: bool, num_beams: int = 1,
):
    """Pipelined twin of _generate_one_at_a_time. Every segment's spliced
    input has the same static shape, so the segments are stacked along
    the BATCH axis and encoded in ONE pipelined pass (S separate GPipe
    encodes would each pay their own fill/drain bubble); the hidden
    states are then re-interleaved to (B, S*L, D) and the decode runs
    tp-sharded on pipe-gathered decoder params. Stacking preserves batch
    divisibility: S*B % (data x n_micro) holds whenever B's does."""
    from ..parallel.pipeline import gather_decoder_over_pipe, t5_encode_pp

    seg_inputs, seg_masks = [], []
    for seg_in, seg_mask in _one_at_a_time_segments(
        lm_params, mapper_params, cfg, prefix, tokens, mask,
        num_segments, with_prefix,
    ):
        if not with_prefix:
            seg_in = t5_lib.embed_tokens(lm_params, cfg.lm, seg_in)
        seg_inputs.append(seg_in)
        seg_masks.append(seg_mask)
    stacked = jnp.concatenate(seg_inputs, axis=0)      # (S*B, L, D)
    stacked_mask = jnp.concatenate(seg_masks, axis=0)  # (S*B, L)
    hidden = t5_encode_pp(
        lm_params, cfg.lm, mesh, stacked, stacked_mask,
        n_micro=n_micro, sequence_parallel=sequence_parallel,
    )
    batch = tokens.shape[0]
    seg_len = hidden.shape[1]
    encoder_hidden = hidden.reshape(
        num_segments, batch, seg_len, -1
    ).transpose(1, 0, 2, 3).reshape(batch, num_segments * seg_len, -1)
    encoder_mask = stacked_mask.reshape(
        num_segments, batch, seg_len
    ).transpose(1, 0, 2).reshape(batch, num_segments * seg_len)
    gathered = gather_decoder_over_pipe(lm_params, mesh)
    if num_beams > 1:
        return _decoding.beam_search_t5(
            gathered, cfg.lm, encoder_hidden, encoder_mask,
            num_beams=num_beams, max_new_tokens=max_new_tokens,
        )
    return _decoding.greedy_decode_t5(
        gathered, cfg.lm, encoder_hidden, encoder_mask, max_new_tokens
    )


def _pad_rows(arr: Optional[jax.Array], target: int) -> Optional[jax.Array]:
    """Pad the batch axis up to ``target`` rows by repeating the last row
    (pipelined generation needs batch % (data x n_micro) == 0; padded
    rows are sliced off the result)."""
    if arr is None or arr.shape[0] == target:
        return arr
    reps = jnp.broadcast_to(
        arr[-1:], (target - arr.shape[0],) + arr.shape[1:]
    )
    return jnp.concatenate([arr, reps], axis=0)


class VCT0Model:
    """Thin orchestration wrapper over the jitted compute units.

    Holds (cfg, params) and exposes the reference's model surface. VCT0Prefix
    (frozen-LM variant) is this class with ``cfg.freeze_lm=True`` — the
    trainable parameter set is ``params['mapper']`` only.
    """

    def __init__(self, cfg: VCT0Config, params: Params):
        self.cfg = cfg
        self.params = params
        # set by the executor when a 3-D (data, pipe, model) mesh is
        # active: (mesh, n_micro, sequence_parallel). Routes every
        # generate path through its pipelined twin (main / no_prefix /
        # prefix-only / one-at-a-time / forced-decoder / beam).
        self.pipeline_ctx = None

    # --- reference: VCT0Model.forward (vct0.py:380-394) ---
    def forward_loss(self, clip_embeddings: jax.Array,
                     labels: jax.Array) -> jax.Array:
        return vct0_caption_loss(
            self.params["mapper"], self.params["lm"], self.cfg,
            clip_embeddings, labels,
        )

    # --- reference: VCT0Model.generate (vct0.py:396-491) ---
    def generate(
        self,
        prefix: Optional[jax.Array] = None,        # (B, P, prefix_size)
        question_tokens: Optional[jax.Array] = None,
        question_mask: Optional[jax.Array] = None,
        decoder_input_ids: Optional[jax.Array] = None,
        no_prefix: bool = False,
        pass_examples_through_encoder_one_at_a_time: bool = False,
        num_shots: Optional[int] = None,
        max_new_tokens: int = 20,
        num_beams: int = 1,
        force_eos_at: Optional[jax.Array] = None,
        prefill_chunks: int = 1,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (tokens (B, T), token_logprobs (B, T)). With
        num_beams > 1 the logprobs are the winning hypothesis's true
        per-token values (tracked through beam reorders), so
        ``score_sequences`` works identically for greedy and beam.

        ``force_eos_at`` ((B,) int32, bench_generate.py --eos_at_steps)
        force-finishes each row at a chosen decode step so the early-exit
        loop can be measured under a realistic answer-length
        distribution; main greedy path only.

        ``prefill_chunks`` > 1 runs the encoder + cross-KV cache build in
        batch chunks (value-equal; cuts the prefill activation peak that
        sets the decode batch-capacity wall — see
        ops/decoding.py::chunked_prefill_greedy_decode_t5); main greedy
        path only."""
        if force_eos_at is not None and (
            num_beams > 1 or no_prefix or decoder_input_ids is not None
            or pass_examples_through_encoder_one_at_a_time
            or self.pipeline_ctx is not None or question_tokens is None
        ):
            raise ValueError(
                "force_eos_at is a bench hook for the main single-device "
                "greedy generate path only"
            )
        if prefill_chunks > 1 and (
            num_beams > 1 or no_prefix or decoder_input_ids is not None
            or pass_examples_through_encoder_one_at_a_time
            or self.pipeline_ctx is not None or question_tokens is None
        ):
            raise ValueError(
                "prefill_chunks > 1 is supported on the main "
                "single-device greedy generate path only"
            )
        if num_beams > 1 and decoder_input_ids is not None:
            # forced_decode_t5 teacher-forces then continues GREEDILY;
            # silently ignoring num_beams would misreport the run
            raise ValueError(
                "num_beams > 1 with a forced decoder prefix "
                "(decoder_input_modules) is not implemented — the forced "
                "path continues greedily after teacher forcing; set "
                "num_beams=1 or drop decoder_input_modules"
            )
        if num_beams > 1 and question_tokens is None:
            raise ValueError(
                "num_beams > 1 is not supported on the prefix-only "
                "captioning path (greedy decode only)"
            )
        cfg, params = self.cfg, self.params
        lm_params, mapper_params = params["lm"], params["mapper"]
        ctx = self.pipeline_ctx
        orig_batch = None
        if ctx is not None:
            # pipelined paths need batch % (data x n_micro) == 0; pad by
            # repeating the last row, slice the result back
            mesh_, n_micro_, _ = ctx
            need = mesh_.shape["data"] * n_micro_
            ref = prefix if prefix is not None else question_tokens
            if ref is not None and ref.shape[0] % need:
                orig_batch = ref.shape[0]
                target = ((orig_batch + need - 1) // need) * need
                prefix = _pad_rows(prefix, target)
                question_tokens = _pad_rows(question_tokens, target)
                question_mask = _pad_rows(question_mask, target)
                decoder_input_ids = _pad_rows(decoder_input_ids, target)
        if orig_batch is not None:
            tokens, lps = self._generate_inner(
                prefix, question_tokens, question_mask, decoder_input_ids,
                no_prefix, pass_examples_through_encoder_one_at_a_time,
                num_shots, max_new_tokens, num_beams, force_eos_at,
                prefill_chunks,
            )
            return tokens[:orig_batch], lps[:orig_batch]
        return self._generate_inner(
            prefix, question_tokens, question_mask, decoder_input_ids,
            no_prefix, pass_examples_through_encoder_one_at_a_time,
            num_shots, max_new_tokens, num_beams, force_eos_at,
            prefill_chunks,
        )

    def _generate_inner(
        self, prefix, question_tokens, question_mask, decoder_input_ids,
        no_prefix, pass_examples_through_encoder_one_at_a_time, num_shots,
        max_new_tokens, num_beams, force_eos_at=None, prefill_chunks=1,
    ) -> Tuple[jax.Array, jax.Array]:
        cfg, params = self.cfg, self.params
        lm_params, mapper_params = params["lm"], params["mapper"]
        ctx = self.pipeline_ctx

        if no_prefix:
            if pass_examples_through_encoder_one_at_a_time:
                if ctx is not None:
                    mesh, n_micro, sp = ctx
                    return _generate_one_at_a_time_pp(
                        lm_params, mapper_params, cfg, mesh, None,
                        question_tokens, question_mask,
                        num_segments=question_tokens.shape[1],
                        max_new_tokens=max_new_tokens, with_prefix=False,
                        n_micro=n_micro, sequence_parallel=sp,
                        num_beams=num_beams,
                    )
                return _generate_one_at_a_time(
                    lm_params, mapper_params, cfg, None, question_tokens,
                    question_mask, num_segments=question_tokens.shape[1],
                    max_new_tokens=max_new_tokens, with_prefix=False,
                    num_beams=num_beams,
                )
            if ctx is not None:
                mesh, n_micro, sp = ctx
                return _generate_no_prefix_pp(
                    lm_params, cfg, mesh, question_tokens, question_mask,
                    max_new_tokens=max_new_tokens, n_micro=n_micro,
                    sequence_parallel=sp, num_beams=num_beams,
                )
            return _generate_no_prefix(
                lm_params, cfg, question_tokens, question_mask,
                max_new_tokens, num_beams=num_beams,
            )

        if pass_examples_through_encoder_one_at_a_time:
            if ctx is not None:
                mesh, n_micro, sp = ctx
                return _generate_one_at_a_time_pp(
                    lm_params, mapper_params, cfg, mesh, prefix,
                    question_tokens, question_mask,
                    num_segments=question_tokens.shape[1],
                    max_new_tokens=max_new_tokens, with_prefix=True,
                    n_micro=n_micro, sequence_parallel=sp,
                    num_beams=num_beams,
                )
            return _generate_one_at_a_time(
                lm_params, mapper_params, cfg, prefix, question_tokens,
                question_mask, num_segments=question_tokens.shape[1],
                max_new_tokens=max_new_tokens, with_prefix=True,
                num_beams=num_beams,
            )

        if question_tokens is not None:
            num_prefixes = (
                prefix.shape[1] if num_shots is None else num_shots + 1
            )
            if decoder_input_ids is None:
                if ctx is not None:
                    mesh, n_micro, sp = ctx
                    return _generate_main_pp(
                        lm_params, mapper_params, cfg, mesh, prefix,
                        question_tokens, question_mask,
                        num_prefixes=num_prefixes,
                        max_new_tokens=max_new_tokens, n_micro=n_micro,
                        sequence_parallel=sp, num_beams=num_beams,
                    )
                return _generate_main(
                    lm_params, mapper_params, cfg, prefix, question_tokens,
                    question_mask, num_prefixes=num_prefixes,
                    max_new_tokens=max_new_tokens, num_beams=num_beams,
                    force_eos_at=force_eos_at,
                    prefill_chunks=prefill_chunks,
                )
            # forced decoder prefix: only the test image's prefix is
            # spliced (reference: vct0.py:466-482)
            if ctx is not None:
                mesh, n_micro, sp = ctx
                return _generate_forced_pp(
                    lm_params, mapper_params, cfg, mesh, prefix,
                    question_tokens, question_mask, decoder_input_ids,
                    max_new_tokens=max_new_tokens, n_micro=n_micro,
                    sequence_parallel=sp,
                )
            return _generate_forced(
                lm_params, mapper_params, cfg, prefix, question_tokens,
                question_mask, decoder_input_ids, max_new_tokens,
            )

        # prefix-only captioning generation (reference: vct0.py:484-491)
        if ctx is not None:
            mesh, n_micro, sp = ctx
            return _generate_prefix_only_pp(
                lm_params, mapper_params, cfg, mesh, prefix,
                max_new_tokens=max_new_tokens, n_micro=n_micro,
                sequence_parallel=sp,
            )
        return _generate_prefix_only(
            lm_params, mapper_params, cfg, prefix, max_new_tokens
        )

    def score_sequences(self, tokens: jax.Array,
                        token_logprobs: jax.Array) -> jax.Array:
        return _decoding.sequence_scores(tokens, token_logprobs)

    # --- int8 SmoothQuant calibration (deferred quantization) ---------
    def encoder_calibration_batch(
        self,
        prefix: Optional[jax.Array] = None,
        question_tokens: Optional[jax.Array] = None,
        question_mask: Optional[jax.Array] = None,
        no_prefix: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        """The spliced encoder inputs (embeds, mask) for one eval batch —
        the calibration surface for SmoothQuant int8 quantization. Covers
        the main spliced path (reference: vct0.py:446-464) and no_prefix;
        the exotic modes calibrate via models.t5.calibrate_encoder_act_max
        directly."""
        lm_params, mapper_params = self.params["lm"], self.params["mapper"]
        if no_prefix or prefix is None:
            emb = t5_lib.embed_tokens(lm_params, self.cfg.lm,
                                      question_tokens)
            return emb, question_mask
        if question_tokens.ndim != 2:
            raise ValueError(
                "int8 calibration supports the main spliced eval path "
                "(2-D question tokens); for one-at-a-time/ensemble modes "
                "calibrate via models.t5.calibrate_encoder_act_max"
            )
        text_embeds = t5_lib.embed_tokens(lm_params, self.cfg.lm,
                                          question_tokens)
        prefix_proj = project_prefix(self.cfg, mapper_params, prefix)
        joint, joint_mask = insert_prefix_into_input(
            question_tokens, text_embeds,
            prefix_proj.astype(text_embeds.dtype), question_mask,
            prefix_length=self.cfg.prefix_length,
            num_prefixes=prefix.shape[1], base_id=self.cfg.sentinel_base,
        )
        return joint, joint_mask

    def calibrate_and_quantize_int8(self, batches, alpha: float = 0.5,
                                    groups="auto") -> Dict[str, Any]:
        """One-shot SmoothQuant calibration + int8 quantization of the
        frozen LM encoder, deferred from build time so real eval batches
        can supply the activation statistics (tpu.int8_calibrate_batches).

        ``batches``: iterable of dicts accepted by
        ``encoder_calibration_batch``. Returns the accumulated act-max
        stats and swaps quantized LM params into ``self.params`` (the
        executor re-places them on its mesh afterwards)."""
        import numpy as np

        lm_cfg = self.cfg.lm
        if not (lm_cfg.int8_encoder_ffn or lm_cfg.int8_encoder_attn):
            raise ValueError(
                "calibrate_and_quantize_int8 needs an int8 encoder mode "
                "enabled (tpu.int8_encoder_ffn / tpu.int8_encoder_attn)"
            )
        stats = None
        for b in batches:
            emb, m = self.encoder_calibration_batch(**b)
            cur = t5_lib.calibrate_encoder_act_max(
                self.params["lm"], lm_cfg, [(emb, m)]
            )
            stats = cur if stats is None else {
                k: np.maximum(stats[k], cur[k]) for k in stats
            }
        if stats is None:
            raise ValueError("int8 calibration needs >= 1 batch")
        if jax.process_count() > 1:
            # every process calibrates on ITS data shard; the quantized
            # weights must be bit-identical everywhere (they ride
            # replicated through collectives), so max-reduce the stats
            # across processes before folding
            from jax.experimental import multihost_utils

            for k in stats:
                gathered = multihost_utils.process_allgather(
                    jnp.asarray(stats[k])
                )
                stats[k] = np.asarray(gathered, np.float32).max(axis=0)
        lm = self.params["lm"]
        if lm_cfg.int8_encoder_ffn:
            lm = t5_lib.quantize_encoder_ffn(
                lm, groups=groups, act_max=stats["ffn"], alpha=alpha
            )
        if lm_cfg.int8_encoder_attn:
            lm = t5_lib.quantize_encoder_attn(
                lm, groups=groups, act_max=stats["attn"], alpha=alpha
            )
        if lm_cfg.int8_decoder_step and "step_q8" not in lm["decoder"]:
            # weight-only (no activation stats involved); quantized here
            # so the deferred-calibration path leaves no mode behind
            lm = t5_lib.quantize_decoder_step(lm, groups=groups,
                                              drop_bf16=True)
        self.params = dict(self.params)
        self.params["lm"] = lm
        return stats


@MODELS.register("VCT0Model")
def build_vct0_model(cfg: VCT0Config, params: Params) -> VCT0Model:
    return VCT0Model(dataclasses.replace(cfg, freeze_lm=False), params)


@MODELS.register("VCT0Prefix")
def build_vct0_prefix(cfg: VCT0Config, params: Params) -> VCT0Model:
    """Frozen-LM variant (reference: vct0.py:535-544): only
    params['mapper'] is trainable."""
    return VCT0Model(dataclasses.replace(cfg, freeze_lm=True), params)
