"""Per-op MFU accounting for the mapper train step (VERDICT r4 #2).

The last major compute surface without a %-of-ceiling bound: CC-captioning
mapper training through the frozen T0-3B (reference:
src/trainers/vct0_exector.py:131-167 — prefix-only encoder input, caption
labels; our jitted twin is bench_train.py / trainers/vct0_executor.py).

What it measures, all on-chip and fetch-synced with K steps amortized per
fetch (the relay's ~55 ms/call overhead rule, see bench.py):

  * full train step (value_and_grad over the mapper + adamw) ms/step
  * forward-only loss ms — the step/fwd ratio is the direct test of
    whether XLA dead-code-eliminates the frozen LM's WEIGHT gradients:
    activation-grad backward costs ~1x forward (one dx matmul per forward
    matmul), so step/fwd ~= 2 when dW is skipped and ~= 3 when it is not
  * analytic FLOPs (fwd + activation-grad bwd, dW excluded) -> achieved
    TFLOP/s vs the 190.6 TFLOP/s measured chip ceiling
  * levers, each measured: remat on/off, fused-attention VJP on/off,
    batch scaling (the 10-token prefix encoder makes small batches
    MXU-starved) — plus the int8-forward bound derived from the measured
    int8/bf16 MXU rate ratio (1.92x, PARITY r3): int8 would at best
    remove half the forward matmul time = <= fwd/2 of the step

Run:  python -m explicit_alignment_for_vqa_tasks_tpu.tools.train_step_study
      [--batches 32,64,128] [--caption_len 32] [--steps 8] [--tiny]
Emits one JSON line; paste the summary into PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial


def t5_train_flops_per_example(cfg, enc_len: int, dec_len: int,
                               with_dw: bool = False) -> float:
    """Analytic matmul FLOPs per example for the captioning step.

    Forward: 2 * (active params) * tokens per component; backward adds
    one dx matmul per forward matmul (~1x forward) — dW matmuls for the
    FROZEN LM are excluded unless with_dw (the XLA-DCE diagnostic).
    Attention score/PV terms included; layernorms/softmax ignored (<2%).
    """
    d, dff, h, dkv = cfg.d_model, cfg.d_ff, cfg.num_heads, cfg.d_kv
    inner = h * dkv
    attn_proj = 4 * d * inner              # q,k,v,o
    ffn = 3 * d * dff                      # gated: wi_0, wi_1, wo
    enc_layer = attn_proj + ffn
    dec_layer = 2 * attn_proj + ffn        # self + cross
    enc = cfg.num_encoder_layers * (
        2 * enc_layer * enc_len            # param matmuls
        + 2 * (2 * enc_len * enc_len * inner)   # scores + PV
    )
    dec = cfg.num_decoder_layers * (
        2 * dec_layer * dec_len
        + 2 * (2 * dec_len * dec_len * inner)       # self scores+PV
        + 2 * (2 * dec_len * enc_len * inner)       # cross scores+PV
    )
    head = 2 * d * cfg.vocab_size * dec_len
    fwd = float(enc + dec + head)
    bwd_factor = 2.0 if with_dw else 1.0   # dx always; dW only if asked
    return fwd * (1.0 + bwd_factor)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="32,64,128,256")
    parser.add_argument("--caption_len", type=int, default=32)
    parser.add_argument("--steps", type=int, default=8,
                        help="train steps chained per timed fetch")
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument("--variants", default="base,remat,xla_attn,fwd",
                        help="comma subset of base,remat,xla_attn,fwd "
                             "(fwd = forward-only loss, the dW-DCE "
                             "diagnostic) — variants beyond `base` run "
                             "at the FIRST batch size only")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny dims for CPU smoke (numbers not "
                             "meaningful)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (axon ignores "
                             "JAX_PLATFORMS env; config.update works)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..models.mappers import MapperConfig
    from ..models.t5 import T5Config
    from ..models.vct0 import VCT0Config, init_vct0_params, vct0_caption_loss
    from ..utils.compilation_cache import enable_compilation_cache

    if not args.cpu:
        # the fused-attention kernels hold weights/scores in VMEM beyond
        # the 16 MB default; must be raised before first backend use
        from ..utils.tpu_flags import ensure_scoped_vmem_limit
        ensure_scoped_vmem_limit(98304)
    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    import dataclasses

    def make_cfg(**over):
        if args.tiny:
            lm = T5Config.small_test(num_heads=4, d_ff=64)
            lm = dataclasses.replace(lm, dtype=jnp.float32, **over)
            prefix_size, n_prefix = 16, 2
        else:
            kw = dict(dtype=jnp.bfloat16, fused_encoder_attention=True)
            kw.update(over)
            lm = T5Config.t0_3b(**kw)
            prefix_size, n_prefix = 768, 10
        return VCT0Config(
            lm=lm,
            mapper=MapperConfig(prefix_size=prefix_size, d_model=lm.d_model,
                                prefix_length=n_prefix,
                                clip_length=n_prefix),
        ), prefix_size, n_prefix

    cfg, prefix_size, n_prefix = make_cfg()
    params = init_vct0_params(jax.random.PRNGKey(0), cfg,
                              param_dtype=cfg.lm.dtype)
    tx = optax.adamw(1e-4)
    ceiling_tflops = 190.6  # bench.py MEASURED_CEILING_TFLOPS

    def build_step(cfg, forward_only=False):
        if forward_only:
            @jax.jit
            def fwd(mapper, lm, clip, labels):
                return vct0_caption_loss(mapper, lm, cfg, clip, labels)

            def run(mapper, opt_state, lm, clip, labels):
                total = jnp.float32(0)
                for _ in range(args.steps):
                    total = total + fwd(mapper, lm, clip, labels)
                return mapper, opt_state, total
            return run

        # donate mapper+opt_state: chained steps reuse the same buffers
        # instead of holding one generation per queued dispatch
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(mapper, opt_state, lm, clip, labels):
            loss, grads = jax.value_and_grad(vct0_caption_loss)(
                mapper, lm, cfg, clip, labels
            )
            updates, opt_state = tx.update(grads, opt_state, mapper)
            return optax.apply_updates(mapper, updates), opt_state, loss

        def run(mapper, opt_state, lm, clip, labels):
            loss = None
            for _ in range(args.steps):
                mapper, opt_state, loss = step(
                    mapper, opt_state, lm, clip, labels
                )
            return mapper, opt_state, loss
        return run

    def measure(cfg, batch, forward_only=False):
        rng = np.random.default_rng(0)
        clip = jnp.asarray(
            rng.standard_normal((batch, prefix_size)).astype(np.float32)
        )
        labels = jnp.asarray(rng.integers(
            2, cfg.lm.vocab_size - 100,
            size=(batch, args.caption_len),
        ).astype(np.int32))
        run = build_step(cfg, forward_only)

        def fresh_mapper():
            # the train step donates its mapper/opt_state buffers, so
            # each trial needs its own copy of the initial params
            return jax.tree.map(jnp.copy, params["mapper"])

        mapper = fresh_mapper()
        opt_state = tx.init(mapper)
        t0 = time.perf_counter()
        mapper, opt_state, loss = run(mapper, opt_state, params["lm"],
                                      clip, labels)
        float(jnp.sum(loss))
        print(f"  compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(args.trials):
            mapper = fresh_mapper()
            opt_state = tx.init(mapper)
            t0 = time.perf_counter()
            mapper, opt_state, loss = run(mapper, opt_state, params["lm"],
                                          clip, labels)
            float(jnp.sum(loss))  # fetch = the only trusted barrier
            best = min(best, (time.perf_counter() - t0) / args.steps)
        flops = t5_train_flops_per_example(cfg.lm, n_prefix,
                                           args.caption_len)
        if forward_only:
            flops = flops / 2.0   # fwd is half of fwd + 1x-dx-bwd
        achieved = batch * flops / best / 1e12
        return {
            "ms_per_step": round(best * 1e3, 2),
            "examples_per_s": round(batch / best, 1),
            "analytic_gflop_per_example": round(flops / 1e9, 1),
            "achieved_tflops_per_s": round(achieved, 1),
            "pct_of_measured_ceiling": round(
                100 * achieved / ceiling_tflops, 1),
        }

    batches = [int(b) for b in args.batches.split(",") if b]
    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    results = {"batch_sweep": {}, "variants": {}}

    for batch in batches:
        print(f"batch {batch} (base)", file=sys.stderr)
        try:
            results["batch_sweep"][str(batch)] = measure(cfg, batch)
        except Exception as exc:
            results["batch_sweep"][str(batch)] = {"error": str(exc)[:200]}
            print(f"  failed: {str(exc)[:200]}", file=sys.stderr)

    b0 = batches[0]
    base = results["batch_sweep"].get(str(b0), {})
    for variant in variants:
        if variant == "base":
            results["variants"]["base"] = base
            continue
        print(f"variant {variant} @ B={b0}", file=sys.stderr)
        try:
            if variant == "fwd":
                point = measure(cfg, b0, forward_only=True)
                if "ms_per_step" in base:
                    point["step_over_fwd_ratio"] = round(
                        base["ms_per_step"] / point["ms_per_step"], 2
                    )
            elif variant == "remat":
                cfg_v, _, _ = make_cfg(remat=True)
                point = measure(cfg_v, b0)
            elif variant == "xla_attn":
                cfg_v, _, _ = make_cfg(fused_encoder_attention=False)
                point = measure(cfg_v, b0)
            else:
                raise ValueError(f"unknown variant {variant}")
            results["variants"][variant] = point
        except Exception as exc:
            results["variants"][variant] = {"error": str(exc)[:200]}
            print(f"  failed: {str(exc)[:200]}", file=sys.stderr)

    # int8-forward bound (measured-rate arithmetic, not a run): int8 MXU
    # at 1.92x the bf16 rate (PARITY r3, measured 366 TOPS vs 190.6) can
    # at best remove (1 - 1/1.92) of the FORWARD matmul time; with
    # step = fwd + bwd (dx in bf16), the e2e ceiling is:
    fwd_point = results["variants"].get("fwd", {})
    if "ms_per_step" in fwd_point and "ms_per_step" in base:
        fwd_ms = fwd_point["ms_per_step"]
        step_ms = base["ms_per_step"]
        saved = fwd_ms * (1 - 1 / 1.92)
        results["int8_forward_bound"] = {
            "assumption": "W8A8 forward through the frozen LM at the "
                          "measured 1.92x int8/bf16 MXU rate; dx backward "
                          "stays bf16; drift opt-in like eval int8",
            "max_step_speedup": round(step_ms / (step_ms - saved), 3),
            "max_saved_ms": round(saved, 2),
        }

    print(json.dumps({
        "metric": "vct0_3b_mapper_train_step_study",
        "config": {"caption_len": args.caption_len,
                   "prefix_length": n_prefix,
                   "steps_per_fetch": args.steps, "tiny": args.tiny,
                   "ceiling_tflops": ceiling_tflops},
        **results,
    }))


if __name__ == "__main__":
    main()
