"""bf16-vs-fp32 drift study at t5-large-ish scale (round-1 review #9).

The framework runs the frozen LM in bfloat16; the reference ran fp32/fp16
torch. This quantifies where bf16 numerics diverge with depth: one random
t5-large-shaped model (24+24 layers, d=1024), same params, forward under
fp32 and bf16 compute, reporting per-encoder-layer relative error plus
final-logit agreement (top-1 match rate / rank correlation proxy), AND —
round 3 — drift through the full 20-step autoregressive GREEDY DECODE
(the strongest no-weights accuracy-parity evidence available: a VQA
answer changes only if some decode step's argmax flips, so the per-step
flip rate upper-bounds the answer-level disagreement; fed-back token
divergence is what a teacher-forced comparison cannot see).

Run:  python -m explicit_alignment_for_vqa_tasks_tpu.tools.bf16_drift_study
Emits one JSON line; paste the summary into PARITY.md.
"""

from __future__ import annotations

import dataclasses
import json
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.t5 import (
        T5Config,
        init_t5_params,
        t5_decode,
        t5_encode,
    )
    from ..ops.decoding import greedy_decode_t5

    # t5-large shape (~770M params)
    cfg32 = T5Config(
        vocab_size=32128, d_model=1024, d_kv=64, num_heads=16, d_ff=2816,
        num_encoder_layers=24, num_decoder_layers=24, dtype=jnp.float32,
    )
    cfg16 = dataclasses.replace(cfg32, dtype=jnp.bfloat16)

    print("initializing t5-large-shaped params (fp32)...", file=sys.stderr)
    params = init_t5_params(jax.random.PRNGKey(0), cfg32, jnp.float32)

    rng = np.random.default_rng(0)
    batch, length, dec_len = 4, 64, 8
    ids = jnp.asarray(rng.integers(2, 32000, (batch, length)), jnp.int32)
    mask = jnp.ones((batch, length), jnp.int32)
    dec_ids = jnp.asarray(
        rng.integers(2, 32000, (batch, dec_len)), jnp.int32
    )
    dec_ids = dec_ids.at[:, 0].set(0)

    def run(cfg):
        final, per_layer = t5_encode(
            params, cfg, input_ids=ids, attention_mask=mask,
            collect_hiddens=True,
        )
        logits = t5_decode(params, cfg, dec_ids, final, mask)
        return (np.asarray(per_layer, dtype=np.float32),
                np.asarray(logits, dtype=np.float32))

    print("forward fp32...", file=sys.stderr)
    per32, logits32 = run(cfg32)
    print("forward bf16...", file=sys.stderr)
    per16, logits16 = run(cfg16)

    layer_rel = []
    for i in range(per32.shape[0]):
        num = np.linalg.norm(per16[i] - per32[i])
        den = np.linalg.norm(per32[i]) + 1e-12
        layer_rel.append(float(num / den))

    top1 = float((logits16.argmax(-1) == logits32.argmax(-1)).mean())
    # how far down the fp32 ranking the bf16 argmax lands, worst case
    flat32 = logits32.reshape(-1, logits32.shape[-1])
    flat16 = logits16.reshape(-1, logits16.shape[-1])
    bf16_pick = flat16.argmax(-1)
    rank_of_pick = (
        flat32 > flat32[np.arange(len(flat32)), bf16_pick][:, None]
    ).sum(-1)
    # ---- drift through the 20-step greedy DECODE (fed-back tokens) ----
    # Wider prompt batch for flip statistics; per-step agreement is
    # measured only while BOTH rows are still on the same trajectory
    # (after the first flip the comparison is between different prompts
    # to the decoder, so later steps are reported separately).
    print("greedy decode fp32 vs bf16...", file=sys.stderr)
    dec_batch, max_new = 16, 20
    ids_d = jnp.asarray(
        rng.integers(2, 32000, (dec_batch, length)), jnp.int32
    )
    mask_d = jnp.ones((dec_batch, length), jnp.int32)

    def decode(cfg):
        hidden = t5_encode(params, cfg, input_ids=ids_d,
                           attention_mask=mask_d)
        tokens, lps = greedy_decode_t5(params, cfg, hidden, mask_d,
                                       max_new_tokens=max_new)
        return np.asarray(tokens), np.asarray(lps, dtype=np.float32)

    tok32, lp32 = decode(cfg32)
    tok16, lp16 = decode(cfg16)
    same = tok32 == tok16
    # first step at which each row's trajectory flips (max_new = never)
    first_flip = np.where(
        same.all(axis=1), max_new, (~same).argmax(axis=1)
    )
    on_track = (
        np.arange(max_new)[None, :] <= first_flip[:, None]
    )  # incl. the flip step itself
    per_step_flip = []
    for t in range(max_new):
        rows = first_flip >= t  # rows still on the fp32 trajectory at t
        if rows.sum() == 0:
            per_step_flip.append(None)
            continue
        per_step_flip.append(
            round(float((tok32[rows, t] != tok16[rows, t]).mean()), 4)
        )
    full_seq_match = float(same.all(axis=1).mean())
    # logprob drift while on-trajectory (identical decoder inputs)
    lp_diff = np.abs(lp32 - lp16)[on_track & same]

    out = {
        "metric": "bf16_drift_t5_large_random",
        "per_layer_rel_error": [round(x, 5) for x in layer_rel],
        "first_layer_rel_error": round(layer_rel[0], 5),
        "last_layer_rel_error": round(layer_rel[-1], 5),
        "growth_factor": round(layer_rel[-1] / max(layer_rel[0], 1e-9), 2),
        "logit_top1_match": round(top1, 4),
        "bf16_pick_worst_fp32_rank": int(rank_of_pick.max()),
        "logit_max_abs_diff": round(
            float(np.abs(logits16 - logits32).max()), 4
        ),
        "logit_rel_error": round(float(
            np.linalg.norm(logits16 - logits32)
            / np.linalg.norm(logits32)
        ), 5),
        "shapes": {"batch": batch, "enc_len": length, "dec_len": dec_len,
                   "layers": 24, "d_model": 1024},
        "greedy_decode": {
            "batch": dec_batch, "max_new_tokens": max_new,
            "full_sequence_match_rate": round(full_seq_match, 4),
            "per_step_flip_rate_on_trajectory": per_step_flip,
            "mean_first_flip_step": round(float(first_flip.mean()), 2),
            "on_trajectory_logprob_mean_abs_diff": round(
                float(lp_diff.mean()) if lp_diff.size else 0.0, 5
            ),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
