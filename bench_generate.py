"""Secondary benchmark: flagship few-shot VQA generation throughput.

Measures the production eval surface — prefix splice + T0-3B-architecture
encoder pass + 20-step greedy decode with KV cache — in prompts/sec/chip.
Not part of the driver's bench.py contract (kept separate to keep bench.py
fast); run manually:  python bench_generate.py [--batch 16] [--seq 512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--seq", type=int, default=512)
    parser.add_argument("--shots", type=int, default=4)
    parser.add_argument("--decode_steps", type=int, default=20)
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument("--fused_ffn", action="store_true",
                        help="fused Pallas encoder FFN (raises the "
                        "scoped-VMEM limit; separate compile-cache key)")
    parser.add_argument("--int8_cross_kv", action="store_true",
                        help="int8 cross-attention KV cache (halves the "
                        "decode-time HBM capacity wall; unlocks B>32)")
    parser.add_argument("--int8_ffn", action="store_true",
                        help="int8 encoder FFN on the MXU (opt-in bulk-"
                        "eval mode, 1.27x the encoder; raises the "
                        "scoped-VMEM limit)")
    parser.add_argument("--int8_kv_layout", type=str, default="auto",
                        choices=["auto", "unmerged", "merged",
                                 "transposed"],
                        help="cross-KV storage layout (auto = transposed "
                        "iff B>=96 else unmerged; see "
                        "T5Config.int8_kv_layout)")
    parser.add_argument("--int8_groups", type=int, default=0,
                        help="contraction groups for the int8 encoder "
                             "quantizers: 0 = auto (the grouped default, "
                             "8 at T0-3B widths), 1 = per-channel (the "
                             "round-3 initial scheme) — for the "
                             "grouped-vs-per-channel flagship A/B")
    parser.add_argument("--eos_step1", action="store_true",
                        help="zero the lm_head and set eos=0 so every row "
                        "emits EOS at decode step 1 — measures the "
                        "early-exit while_loop's best case on hardware "
                        "(encoder + splice + prefill + one step), i.e. "
                        "the floor real short VQA answers approach; the "
                        "default run (random weights never emit EOS) "
                        "pays the full --decode_steps budget and is the "
                        "conservative bound")
    parser.add_argument("--eos_at_steps", type=str, default="",
                        help="comma list, e.g. '2,3,4,5': force each row "
                        "to finish at a step sampled (per row, seeded) "
                        "from the list — measures the early-exit loop "
                        "under a REALISTIC answer-length distribution "
                        "instead of the two extremes (--eos_step1 floor "
                        "vs the full-budget default). VQA answers are "
                        "1-3 words = 2-5 sentencepiece+EOS steps "
                        "(reference: src/get_answer_length.ipynb; "
                        "tools/answer_length_analysis.py)")
    parser.add_argument("--int8_attn", action="store_true",
                        help="int8 encoder QKV/O projections around the "
                        "bf16 attention core (opt-in, composes with "
                        "--int8_ffn)")
    parser.add_argument("--int8_decoder", action="store_true",
                        help="weight-only int8 decode-step matmuls "
                        "(self q/k/v/o, cross q/o, FFN) — halves the "
                        "per-step HBM weight stream; composes with the "
                        "other int8 flags")
    parser.add_argument("--prefill_chunks", type=int, default=1,
                        help="run the encoder + cross-KV cache build in "
                        "N batch chunks (value-equal); cuts the prefill "
                        "activation peak that sets the decode "
                        "batch-capacity wall — lets B=112+ fit where "
                        "unchunked prefill OOMs (PARITY 'Decode "
                        "batch-capacity curve')")
    parser.add_argument("--ensembles", type=int, default=0,
                        help="E > 0: measure the prompt-permutation "
                        "ensembling eval surface (E members per question, "
                        "sequence-log-prob argmax pick — the reference's "
                        "--num_permutations_of_in_context_examples)")
    parser.add_argument("--members_per_call", type=int, default=1,
                        help="with --ensembles: stack m members into the "
                        "batch dim per generate call "
                        "(tpu.ensemble_members_per_call; 1 = the "
                        "reference-style per-member loop). Total rows per "
                        "call = batch*m — size to chip capacity")
    args = parser.parse_args()

    if args.fused_ffn or args.int8_ffn or args.int8_attn:
        from explicit_alignment_for_vqa_tasks_tpu.utils.tpu_flags import (
            ensure_scoped_vmem_limit,
        )

        ensure_scoped_vmem_limit(98304)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (
        MapperConfig,
    )
    from explicit_alignment_for_vqa_tasks_tpu.models.t5 import T5Config
    from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (
        VCT0Config,
        VCT0Model,
        init_vct0_params,
    )
    from explicit_alignment_for_vqa_tasks_tpu.ops.prefix_splice import (
        T5_SENTINEL_BASE,
    )

    from explicit_alignment_for_vqa_tasks_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    lm_cfg = T5Config.t0_3b(dtype=jnp.bfloat16,
                            fused_encoder_attention=True,
                            fused_encoder_ffn=args.fused_ffn,
                            int8_cross_kv=args.int8_cross_kv,
                            int8_kv_layout=(
                                None if args.int8_kv_layout == "auto"
                                else args.int8_kv_layout),
                            int8_encoder_ffn=args.int8_ffn,
                            int8_encoder_attn=args.int8_attn,
                            int8_decoder_step=args.int8_decoder)
    cfg = VCT0Config(
        lm=lm_cfg,
        mapper=MapperConfig(prefix_size=768, d_model=lm_cfg.d_model,
                            prefix_length=10, clip_length=10),
    )
    if args.eos_step1:
        # all-zero lm_head -> all logits equal -> argmax = token 0; with
        # eos_token_id=0 every row finishes at step 1 and the decode
        # while_loop exits after a single iteration (bit-exact semantics
        # pinned vs HF in tests/test_decoding.py).
        import dataclasses

        lm_cfg = dataclasses.replace(lm_cfg, eos_token_id=0)
        cfg = VCT0Config(lm=lm_cfg, mapper=cfg.mapper)
    params = init_vct0_params(jax.random.PRNGKey(0), cfg,
                              param_dtype=jnp.bfloat16)
    if args.eos_step1:
        params["lm"]["lm_head"] = jnp.zeros_like(params["lm"]["lm_head"])
    groups = "auto" if args.int8_groups <= 0 else args.int8_groups
    if args.int8_ffn:
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            quantize_encoder_ffn,
        )

        params["lm"] = quantize_encoder_ffn(params["lm"], groups=groups)
    if args.int8_attn:
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            quantize_encoder_attn,
        )

        params["lm"] = quantize_encoder_attn(params["lm"], groups=groups)
    if args.int8_decoder:
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            quantize_decoder_step,
        )

        # drop_bf16: the bf16 decoder copies (~2.7 GB) are dead in eval
        # and keeping both resident OOMs at the B=64 capacity point
        params["lm"] = quantize_decoder_step(params["lm"], groups=groups,
                                             drop_bf16=True)
    model = VCT0Model(cfg, params)

    B, L, P = args.batch, args.seq, args.shots + 1
    rng = np.random.default_rng(0)
    tokens = rng.integers(10, 30000, size=(B, L)).astype(np.int32)
    # one sentinel per prefix at spaced positions
    for i in range(P):
        tokens[:, i * (L // P)] = T5_SENTINEL_BASE - i
    mask = np.ones((B, L), dtype=np.int32)
    prefix = rng.standard_normal((B, P, 768)).astype(np.float32)

    tok_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)
    prefix_j = jnp.asarray(prefix)

    force_eos_at = None
    mean_forced_len = None
    if args.eos_at_steps:
        steps = [int(s) for s in args.eos_at_steps.split(",") if s]
        sampled = rng.choice(np.asarray(steps, np.int32), size=B)
        mean_forced_len = float(sampled.mean())
        force_eos_at = jnp.asarray(sampled.astype(np.int32))

    if args.ensembles > 0:
        from explicit_alignment_for_vqa_tasks_tpu.trainers.\
            few_shot_vqa_executor import ensemble_generate

        E = args.ensembles
        ens_tokens = rng.integers(10, 30000, size=(B, E, L)).astype(np.int32)
        for i in range(P):
            ens_tokens[:, :, i * (L // P)] = T5_SENTINEL_BASE - i
        ens_mask = np.ones((B, E, L), dtype=np.int32)
        ens_prefix = rng.standard_normal((B, E, P, 768)).astype(np.float32)
        ens_tok_j = jnp.asarray(ens_tokens)
        ens_mask_j = jnp.asarray(ens_mask)
        ens_prefix_j = jnp.asarray(ens_prefix)

        def step():
            # ensemble_generate fetches to host (the argmax pick), so the
            # timing includes the full eval-surface sync
            picked = ensemble_generate(
                model, ens_tok_j, ens_mask_j, ens_prefix_j,
                num_ensembles=E, num_shots=None, no_prefix=False,
                max_new_tokens=args.decode_steps, mode="permutation",
                members_per_call=args.members_per_call,
            )
            return float(picked.sum())
    else:
        def step():
            out_tokens, logprobs = model.generate(
                prefix=prefix_j, question_tokens=tok_j, question_mask=mask_j,
                max_new_tokens=args.decode_steps, force_eos_at=force_eos_at,
                prefill_chunks=args.prefill_chunks,
            )
            # fetch forces execution (block_until_ready is unreliable
            # through the axon tunnel)
            return float(jnp.sum(logprobs))

    t0 = time.perf_counter()
    step()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    best = 0.0
    for _ in range(args.trials):
        t0 = time.perf_counter()
        step()
        dt = time.perf_counter() - t0
        best = max(best, B / dt)
        print(f"step: {dt:.3f}s -> {B / dt:.2f} prompts/s", file=sys.stderr)

    print(json.dumps({
        "metric": "vct0_3b_fewshot_generate_prompts_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "prompts/s",
        "config": {
            "batch": B, "prompt_tokens": L, "shots": args.shots,
            "decode_steps": args.decode_steps,
            "spliced_length": L + 9 * P,
            "eos_step1": bool(args.eos_step1),
            "eos_at_steps": args.eos_at_steps or None,
            "mean_forced_answer_len": mean_forced_len,
            "int8_cross_kv": bool(args.int8_cross_kv),
            "int8_kv_layout": args.int8_kv_layout,
            "int8_encoder_ffn": bool(args.int8_ffn),
            "int8_encoder_attn": bool(args.int8_attn),
            "int8_decoder_step": bool(args.int8_decoder),
            "prefill_chunks": args.prefill_chunks,
            "ensembles": args.ensembles or None,
            "members_per_call": (
                args.members_per_call if args.ensembles else None
            ),
        },
    }))


if __name__ == "__main__":
    main()
