"""ClipCap: frozen GPT-2 + trainable mapping network (prefix prepend).

Reference: src/models/clipcap.py:240-599. The visual prefix is PREPENDED to
the token embeddings (no sentinel splicing); training loss covers only
labeled positions (prefix positions are -100); generation continues from
the embedded prompt with a KV cache (fixing the reference's cache-less
greedy loop, clipcap.py:414-419).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import decoding as _decoding
from ..registry import MODELS
from . import gpt2 as gpt2_lib
from .mappers import MapperConfig, init_mapper, mapper_apply

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ClipCapConfig:
    lm: gpt2_lib.GPT2Config
    mapper: MapperConfig
    freeze_lm: bool = True

    @property
    def prefix_length(self) -> int:
        return self.mapper.prefix_length

    @classmethod
    def from_model_args(cls, model_args: Dict[str, Any],
                        lm_cfg: Optional[gpt2_lib.GPT2Config] = None,
                        freeze_lm: bool = True) -> "ClipCapConfig":
        lm = lm_cfg if lm_cfg is not None else gpt2_lib.GPT2Config.gpt2_small()
        mapper = MapperConfig(
            mapping_type=model_args.get("mapping_type", "mlp"),
            prefix_size=model_args.get("prefix_size", 512),
            d_model=lm.d_model,
            prefix_length=model_args.get("prefix_length", 10),
            clip_length=model_args.get(
                "clip_length", model_args.get("prefix_length", 10)
            ),
            num_layers=model_args.get("num_layers", 8),
        )
        return cls(lm=lm, mapper=mapper, freeze_lm=freeze_lm)


def init_clipcap_params(
    key: jax.Array, cfg: ClipCapConfig, lm_params: Optional[Params] = None,
    param_dtype: Any = jnp.bfloat16,
) -> Params:
    k_lm, k_map = jax.random.split(key)
    if lm_params is None:
        lm_params = gpt2_lib.init_gpt2_params(k_lm, cfg.lm, param_dtype)
    return {"lm": lm_params, "mapper": init_mapper(k_map, cfg.mapper)}


def embed_with_prefix(
    cfg: ClipCapConfig,
    lm_params: Params,
    mapper_params: Params,
    prefix: jax.Array,            # (B, prefix_size)
    input_ids: jax.Array,         # (B, L)
    attention_mask: jax.Array,    # (B, L)
) -> Tuple[jax.Array, jax.Array]:
    """[projected prefix; token embeddings] + positional embeddings.
    Returns (inputs_embeds (B, n+L, D), mask (B, n+L))."""
    n, d = cfg.mapper.prefix_length, cfg.lm.d_model
    batch = input_ids.shape[0]
    prefix_proj = mapper_apply(cfg.mapper, mapper_params, prefix)
    prefix_proj = prefix_proj.reshape(batch, n, d).astype(cfg.lm.dtype)
    tok = lm_params["wte"].astype(cfg.lm.dtype)[input_ids]
    embeds = jnp.concatenate([prefix_proj, tok], axis=1)
    total = embeds.shape[1]
    embeds = embeds + lm_params["wpe"].astype(cfg.lm.dtype)[
        jnp.arange(total)
    ][None]
    mask = jnp.concatenate(
        [jnp.ones((batch, n), dtype=attention_mask.dtype), attention_mask],
        axis=1,
    )
    return embeds, mask


def clipcap_loss(
    mapper_params: Params,
    lm_params: Params,
    cfg: ClipCapConfig,
    prefix: jax.Array,            # (B, prefix_size)
    input_ids: jax.Array,         # (B, L)
    attention_mask: jax.Array,    # (B, L)
    labels: jax.Array,            # (B, L) with -100 on ignored positions
) -> jax.Array:
    """Causal-LM loss over [prefix; tokens]; prefix positions are ignored
    (reference: clipcap.py:290-342). HF-style shift-by-one applies."""
    if cfg.freeze_lm:
        lm_params = jax.tree.map(jax.lax.stop_gradient, lm_params)
    n = cfg.mapper.prefix_length
    batch = input_ids.shape[0]
    embeds, mask = embed_with_prefix(
        cfg, lm_params, mapper_params, prefix, input_ids, attention_mask
    )
    full_labels = jnp.concatenate(
        [jnp.full((batch, n), -100, dtype=labels.dtype), labels], axis=1
    )
    logits = gpt2_lib.gpt2_forward(
        lm_params, cfg.lm, inputs_embeds=embeds, attention_mask=mask
    )
    # causal shift: logits at t predict labels at t+1
    shifted_logits = logits[:, :-1]
    shifted_labels = full_labels[:, 1:]
    valid = shifted_labels != -100
    safe = jnp.where(valid, shifted_labels, 0)
    log_probs = jax.nn.log_softmax(shifted_logits.astype(jnp.float32), -1)
    ll = jnp.take_along_axis(log_probs, safe[..., None], axis=-1)[..., 0]
    return -(ll * valid).sum() / jnp.maximum(valid.sum(), 1)


class ClipCaptionModel:
    """Orchestration wrapper mirroring the reference's model surface."""

    def __init__(self, cfg: ClipCapConfig, params: Params):
        self.cfg = cfg
        self.params = params

    def forward_loss(self, prefix, input_ids, attention_mask, labels):
        return clipcap_loss(
            self.params["mapper"], self.params["lm"], self.cfg,
            prefix, input_ids, attention_mask, labels,
        )

    def generate(
        self,
        prefix: jax.Array,            # (B, P, prefix_size) — last is test img
        question_tokens: jax.Array,   # (B, L)
        question_mask: jax.Array,     # (B, L)
        max_new_tokens: int = 20,
        eos_token_id: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Greedy generation from [prefix; prompt]
        (reference: clipcap.py:344-471, with KV cache here)."""
        if prefix.ndim == 3:
            prefix = prefix[:, -1]  # the test image's embedding
        embeds, mask = embed_with_prefix(
            self.cfg, self.params["lm"], self.params["mapper"],
            prefix, question_tokens, question_mask,
        )
        return _decoding.greedy_decode_gpt2(
            self.params["lm"], self.cfg.lm, embeds, mask,
            max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        )


@MODELS.register("ClipCaptionModel")
def build_clipcap_model(cfg: ClipCapConfig, params: Params):
    return ClipCaptionModel(dataclasses.replace(cfg, freeze_lm=False), params)


@MODELS.register("ClipCaptionPrefix")
def build_clipcap_prefix(cfg: ClipCapConfig, params: Params):
    """Frozen-GPT2 variant (reference: clipcap.py:590-599)."""
    return ClipCaptionModel(dataclasses.replace(cfg, freeze_lm=True), params)
