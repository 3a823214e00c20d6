"""Sentinel prefix splicing — the core "explicit alignment" op.

Replaces each T5 sentinel token ``<extra_id_i>`` (id ``base - i``) in a
tokenized prompt with ``prefix_length`` visual-prefix embedding slots,
shifting the surrounding text embeddings right. Semantics match the
reference's cumulative-count scatter (reference: src/models/vct0.py:494-533):

  * the prompt row must contain exactly ``num_prefixes`` sentinel tokens
    with ids in ``(base - num_prefixes, base]``;
  * output length is STATIC: ``L + (prefix_length - 1) * num_prefixes``;
  * gaps are filled with prefix rows in POSITIONAL order (the j-th sentinel
    encountered left-to-right receives ``prefix_embeds[:, j]``, matching
    the reference's row-major boolean scatter);
  * prefix slots get attention mask 1; text slots keep their mask.

TPU-first design: everything is a fixed-shape vectorized scatter
(``Array.at[...].set(..., mode="drop")``) — no data-dependent shapes, no
host round-trips, fully differentiable, and XLA fuses the index arithmetic.
Out-of-place positions are routed to an out-of-bounds index and dropped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

T5_SENTINEL_BASE = 32099  # id of <extra_id_0>


@functools.partial(
    jax.jit, static_argnames=("prefix_length", "num_prefixes", "base_id")
)
def insert_prefix_into_input(
    tokens: jax.Array,          # (B, L) int — prompt token ids
    text_embeds: jax.Array,     # (B, L, D) — embedded prompt tokens
    prefix_embeds: jax.Array,   # (B, num_prefixes, prefix_length, D)
    attention_mask: jax.Array,  # (B, L) int
    *,
    prefix_length: int,
    num_prefixes: int,
    base_id: int = T5_SENTINEL_BASE,
):
    """Returns (joint_embeds (B, L_out, D), joint_mask (B, L_out)) with
    L_out = L + (prefix_length - 1) * num_prefixes."""
    batch, length, dim = text_embeds.shape
    n = prefix_length
    out_len = length + (n - 1) * num_prefixes

    # sentinel ids are base_id - i for i in [0, num_prefixes)
    is_sentinel = (tokens <= base_id) & (tokens > base_id - num_prefixes)
    sent_before = jnp.cumsum(is_sentinel, axis=1) - is_sentinel  # strictly before

    # out position of a text token j: j + (n-1) * (#sentinels before j);
    # a sentinel's gap starts at the same expression.
    positions = (
        jnp.arange(length, dtype=jnp.int32)[None, :]
        + (n - 1) * sent_before.astype(jnp.int32)
    )

    batch_idx = jnp.arange(batch, dtype=jnp.int32)[:, None]

    # --- text scatter (sentinel rows routed out of bounds and dropped) ----
    text_pos = jnp.where(is_sentinel, out_len, positions)
    joint = jnp.zeros((batch, out_len, dim), dtype=text_embeds.dtype)
    joint = joint.at[batch_idx, text_pos].set(
        text_embeds, mode="drop"
    )
    mask_out = jnp.zeros((batch, out_len), dtype=attention_mask.dtype)
    mask_out = mask_out.at[batch_idx, text_pos].set(
        attention_mask, mode="drop"
    )

    # --- prefix scatter --------------------------------------------------
    # sentinel j (the g-th sentinel in its row, g = sent_before[j]) expands
    # into positions [positions[j], positions[j] + n) holding
    # prefix_embeds[b, g, 0:n]
    offsets = jnp.arange(n, dtype=jnp.int32)[None, None, :]     # (1, 1, n)
    gap_pos = positions[:, :, None] + offsets                    # (B, L, n)
    gap_pos = jnp.where(is_sentinel[:, :, None], gap_pos, out_len)
    # values: gather the g-th prefix block per token position
    gap_idx = jnp.clip(sent_before, 0, num_prefixes - 1)         # (B, L)
    gap_vals = jnp.take_along_axis(
        prefix_embeds, gap_idx[:, :, None, None], axis=1
    )                                                            # (B, L, n, D)
    joint = joint.at[batch_idx[:, :, None], gap_pos].set(
        gap_vals.astype(joint.dtype), mode="drop"
    )
    mask_out = mask_out.at[batch_idx[:, :, None], gap_pos].set(
        jnp.ones_like(gap_pos, dtype=mask_out.dtype), mode="drop"
    )
    return joint, mask_out


def splice_output_length(
    input_length: int, prefix_length: int, num_prefixes: int
) -> int:
    """Static output length of insert_prefix_into_input."""
    return input_length + (prefix_length - 1) * num_prefixes
