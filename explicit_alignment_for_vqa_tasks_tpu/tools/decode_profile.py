"""Trace-backed accounting of the T5 greedy-decode step (review item #5).

Round 1 measured 13.6 ms/decode-step at batch 16 vs a ~3.5 ms
weight-streaming floor and asserted "latency-bound" from two failed
experiments. This tool produces the actual breakdown: it captures a
jax.profiler trace of the steady-state decode loop, parses the chrome
trace (vm.trace.json.gz works through the axon relay), and buckets
device-op durations into matmul / attention / elementwise+fusion /
dynamic-update (KV cache) / other, plus the idle gap between ops.

Run:  python -m explicit_alignment_for_vqa_tasks_tpu.tools.decode_profile
Emits one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time


def bucket_of(name: str) -> str:
    n = name.lower()
    if "dot" in n or "conv" in n or "matmul" in n or "einsum" in n:
        return "matmul"
    if "dynamic-update" in n or "dynamic_update" in n:
        return "kv_update"
    if "reduce" in n or "softmax" in n or "exp" in n or "max" in n:
        return "softmax_reduce"
    if "fusion" in n or "add" in n or "mul" in n or "select" in n:
        return "fusion_elementwise"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout"
    if "while" in n or "condition" in n or "body" in n:
        return "control"
    return "other"


def parse_trace(trace_dir: str) -> dict:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    with gzip.open(paths[0], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # device-op complete events live on TensorCore pids; filter to 'X'
    # events that have device metadata (run_id/hlo fields) or sit on a pid
    # whose name mentions TPU/TensorCore
    pid_names = {
        e["pid"]: e.get("args", {}).get("name", "")
        for e in events if e.get("ph") == "M" and e.get("name") ==
        "process_name"
    }
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "Tensor" in name or "/device" in name.lower()
    }
    ops = [
        e for e in events
        if e.get("ph") == "X" and e.get("pid") in device_pids
        and e.get("dur", 0) > 0
    ]
    if not ops:  # fall back: any X event with an hlo-ish name
        ops = [e for e in events if e.get("ph") == "X"
               and e.get("dur", 0) > 0]
    start = min(e["ts"] for e in ops)
    end = max(e["ts"] + e["dur"] for e in ops)
    buckets: dict = {}
    name_tot: dict = {}
    total_busy = 0
    # per-pid busy to avoid double counting nested events: keep only events
    # without children (approx: sum durations of events at max depth is
    # complex; XLA op events on TPU tracks don't nest, so sum directly)
    for e in ops:
        b = bucket_of(e.get("name", ""))
        buckets[b] = buckets.get(b, 0) + e["dur"]
        key = e.get("name", "?")[:60]
        name_tot[key] = name_tot.get(key, 0) + e["dur"]
        total_busy += e["dur"]
    top = sorted(name_tot.items(), key=lambda kv: -kv[1])[:12]
    return {
        "span_us": end - start,
        "busy_us": total_busy,
        "idle_us": max(0, (end - start) - total_busy),
        "buckets_us": {k: int(v) for k, v in
                       sorted(buckets.items(), key=lambda kv: -kv[1])},
        "top_ops_us": [[k, int(v)] for k, v in top],
        "n_events": len(ops),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--enc_len", type=int, default=557)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--trace_dir", default="")
    parser.add_argument("--int8_cross_kv", action="store_true",
                        help="profile the int8 cross-KV decode (the B=64 "
                        "production point)")
    parser.add_argument("--int8_decoder", action="store_true",
                        help="weight-only int8 decode-step matmuls "
                        "(cfg.int8_decoder_step)")
    parser.add_argument("--int8_kv_layout", default="auto",
                        choices=["auto", "unmerged", "merged",
                                 "transposed"],
                        help="cross-KV storage layout A/B "
                        "(T5Config.int8_kv_layout)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ..models.t5 import T5Config, init_t5_params, t5_encode
    from ..ops.decoding import greedy_decode_t5
    from ..utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = T5Config.t0_3b(dtype=jnp.bfloat16,
                         int8_cross_kv=args.int8_cross_kv,
                         int8_kv_layout=(None if args.int8_kv_layout ==
                                         "auto" else args.int8_kv_layout),
                         int8_decoder_step=args.int8_decoder)
    params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if args.int8_decoder:
        from ..models.t5 import quantize_decoder_step

        params = quantize_decoder_step(params, drop_bf16=True)
    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.enc_len, cfg.d_model),
        dtype=jnp.bfloat16,
    )
    mask = jnp.ones((args.batch, args.enc_len), jnp.int32)
    hidden = jax.jit(
        lambda p, e, m: t5_encode(p, cfg, inputs_embeds=e, attention_mask=m)
    )(params, embeds, mask)

    @jax.jit
    def decode(p, h, m):
        toks, lp = greedy_decode_t5(p, cfg, h, m, args.steps)
        return toks.sum() + lp.sum()

    float(decode(params, hidden, mask))  # compile + warmup
    t0 = time.perf_counter()
    float(decode(params, hidden, mask))
    wall = time.perf_counter() - t0
    print(f"decode wall: {wall * 1000:.1f} ms "
          f"({wall / args.steps * 1000:.2f} ms/step)", file=sys.stderr)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="decode_trace_")
    jax.profiler.start_trace(trace_dir)
    float(decode(params, hidden, mask))
    jax.profiler.stop_trace()

    stats = parse_trace(trace_dir)
    per_step = {k: round(v / args.steps, 1)
                for k, v in stats["buckets_us"].items()}
    print(json.dumps({
        "metric": "t5_decode_step_breakdown",
        "wall_ms_per_step": round(wall / args.steps * 1000, 2),
        "trace": stats,
        "per_step_us": per_step,
        "config": {"int8_cross_kv": bool(args.int8_cross_kv),
                   "int8_kv_layout": args.int8_kv_layout,
                   "batch": args.batch, "enc_len": args.enc_len,
                   "steps": args.steps},
        "trace_dir": trace_dir,
    }))


if __name__ == "__main__":
    main()
