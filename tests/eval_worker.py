"""Worker process for the multi-process FLAGSHIP EVAL test.

Run via subprocess (NOT collected by pytest):
    python tests/eval_worker.py <process_id> <num_processes> <workdir>

The full executor-driven path the pods run: jax.distributed init -> the
FewShotVQAExecutor over a per-process [i::P] shard of the val questions
(data/loader.py BatchIterator sharding) -> _generative_step -> prediction
gather to every host (parallel/gather.py) -> OFFICIAL VQA scoring, whose
full-coverage invariant (reference: src/utils/vqa_tools.py:224-225) only
holds if the shards re-unite exactly.

The parent test computed the single-process metrics on the same fixtures
and wrote them to <workdir>/expected.json; every worker asserts equality.
"""

import json
import os
import sys

BATCH = 2


def main() -> None:
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    workdir = sys.argv[3]
    int8 = len(sys.argv) > 4 and sys.argv[4] == "int8"

    from explicit_alignment_for_vqa_tasks_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed()

    import jax

    assert jax.process_count() == nprocs

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from pathlib import Path

    from test_e2e import build_executor, make_test_config

    with open(os.path.join(workdir, "fixtures.json")) as fh:
        fixtures = json.load(fh)

    # per-process experiment dirs (results/cache must not collide); the
    # fixture DATA paths are shared
    my_dir = Path(workdir) / f"proc{proc_id}"
    my_dir.mkdir(parents=True, exist_ok=True)
    config = make_test_config(my_dir, fixtures)
    # per-host eval: generation is local to each process's device; the
    # only cross-process step is the prediction gather before scoring
    config.tpu.use_mesh = False
    if int8:
        # deferred SmoothQuant calibration on the process's OWN shard:
        # the act-max stats are max-reduced across processes
        # (models/vct0.py) so the quantized weights — and therefore the
        # predictions — are identical to the single-process reference
        # run, which calibrates over the same union of questions
        config.tpu.fused_attention = True
        config.tpu.int8_encoder_ffn = True
        config.tpu.int8_encoder_attn = True
        config.tpu.int8_calibrate_batches = 1  # = this shard's 1 batch
    executor = build_executor(config)

    n_batches = len(executor.test_dataloader)
    metrics = executor.test()

    with open(os.path.join(workdir, "expected.json")) as fh:
        expected = json.load(fh)

    acc = metrics["test_evaluation/accuracy_overall"]
    want = expected["accuracy_overall"]
    assert acc == want, f"sharded accuracy {acc} != single-process {want}"

    # the shard really was a shard (not the whole set)
    total_batches = expected["total_questions"] / BATCH
    assert n_batches < total_batches, (
        f"process {proc_id} saw {n_batches} batches — not sharded"
    )

    # full coverage after gather: answers.pkl has every val question once
    import pickle

    with open(os.path.join(config.results_path, "answers.pkl"), "rb") as fh:
        predictions = pickle.load(fh)
    qids = [p["question_id"] for p in predictions]
    assert sorted(qids) == sorted(expected["question_ids"]), (
        f"coverage broken on process {proc_id}: {sorted(qids)}"
    )
    assert len(set(qids)) == len(qids), "duplicate predictions after gather"

    if proc_id == 0:
        with open(os.path.join(workdir, "eval_host0_ok"), "w") as fh:
            fh.write(f"accuracy={acc}\n")
    print(f"eval worker {proc_id}/{nprocs} OK: accuracy={acc}")


if __name__ == "__main__":
    main()
