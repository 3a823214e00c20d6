"""Quantify the dispatch/collect eval pipelining on the REAL TPU.

BaseExecutor._eval_loop overlaps batch N+1's device generate with batch
N's host fetch + detokenization (~55 ms relay latency + tokenizer decode
per batch). This tool times the same eval twice — pipelined (production)
vs forced-serial — on a 32-val-question synthetic fixture set (16
batches at bs=2, tiny T5 so host-side costs are a visible fraction).

Run manually: python -m explicit_alignment_for_vqa_tasks_tpu.tools.eval_pipeline_bench

Measured 2026-08-17 on the axon-relayed v5e: 1525 ms serial vs 1539 ms
pipelined over 16 batches — NEUTRAL (0.99x). Through this relay,
remote execution starts at the data fetch rather than at dispatch, so
there is no device/host overlap to win; on standard PJRT runtimes
(async dispatch) the pipeline hides the per-batch host work. Kept as
the production loop since it is never slower and is equivalence-tested.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path


def main() -> None:
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(repo_root, "tests"))
    sys.path.insert(0, repo_root)

    import jax

    print(f"eval_pipeline_bench on: {jax.devices()[0]}", flush=True)

    import test_e2e as e2e

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        fixtures = e2e.write_vqa_fixtures(tmp, n_train_imgs=6,
                                          n_val_imgs=32)
        config = e2e.make_test_config(tmp, fixtures)
        config.tpu.compute_dtype = "bfloat16"
        config.tpu.params_dtype = "bfloat16"
        executor = e2e.build_executor(config)

        def run_serial():
            return [
                executor._generative_step(batch, i)
                for i, batch in enumerate(executor.test_dataloader)
            ]

        def run_pipelined():
            return executor._eval_loop()

        # warmup/compile both paths (identical programs)
        run_pipelined()

        results = {}
        for name, fn in (("serial", run_serial),
                         ("pipelined", run_pipelined)):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn()
                best = min(best, time.perf_counter() - t0)
            n = sum(len(o["predictions"]) for o in out)
            results[name] = best
            print(f"{name}: {best*1e3:.0f} ms for {len(out)} batches "
                  f"({n} predictions)", flush=True)
        speedup = results["serial"] / results["pipelined"]
        print(f"pipelining speedup: {speedup:.2f}x")


if __name__ == "__main__":
    main()
