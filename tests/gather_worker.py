"""Worker process for the two-process jax.distributed gather test.

Run via subprocess (NOT collected by pytest):
    python tests/gather_worker.py <process_id> <num_processes> <tmpdir>

The parent sets JAX_PLATFORMS=cpu and JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the environment, so this exercises
the REAL multi-process path: ``maybe_initialize_distributed`` (env-driven
jax.distributed.initialize) + ``gather_predictions_to_host0`` with
unequal per-host shard sizes, then the official VQA full-coverage
invariant (utils/vqa_tools.py load_res_from_list; reference invariant at
src/utils/vqa_tools.py:224-225) on host 0.
"""

import json
import os
import sys


# unequal on purpose: the gather pads to the max payload and must
# truncate each host's blob back to its true length
SHARD_SIZES = [6, 4, 5, 5]


def build_vqa(total, tmpdir):
    from explicit_alignment_for_vqa_tasks_tpu.utils.vqa_tools import VQA

    annotations = {
        "info": {"description": "fixture"},
        "task_type": "Open-Ended",
        "data_type": "mscoco",
        "data_subtype": "val2014",
        "license": {},
        "annotations": [
            {
                "question_id": qid,
                "image_id": 1000 + qid,
                "question_type": "what",
                "answer_type": "other",
                "multiple_choice_answer": f"ans{qid}",
                "answers": [
                    {
                        "answer": f"ans{qid}",
                        "answer_confidence": "yes",
                        "answer_id": i + 1,
                    }
                    for i in range(10)
                ],
            }
            for qid in range(total)
        ],
    }
    questions = {
        "info": {"description": "fixture"},
        "task_type": "Open-Ended",
        "data_type": "mscoco",
        "data_subtype": "val2014",
        "license": {},
        "questions": [
            {
                "question_id": qid,
                "image_id": 1000 + qid,
                "question": f"q{qid}?",
            }
            for qid in range(total)
        ],
    }
    ann_path = os.path.join(tmpdir, "annotations.json")
    q_path = os.path.join(tmpdir, "questions.json")
    with open(ann_path, "w", encoding="utf-8") as fh:
        json.dump(annotations, fh)
    with open(q_path, "w", encoding="utf-8") as fh:
        json.dump(questions, fh)
    return VQA(ann_path, q_path)


def main() -> None:
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    tmpdir = sys.argv[3]
    if os.environ.get("GATHER_WORKER_DEBUG"):
        import json as _json

        import jax
        print("DBG jax_platforms cfg:", jax.config.jax_platforms, flush=True)
        with open(os.path.join(tmpdir, f"env{proc_id}.json"), "w") as fh:
            _json.dump(dict(os.environ), fh)

    from explicit_alignment_for_vqa_tasks_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed(), (
        "maybe_initialize_distributed returned False; env not wired?"
    )

    import jax

    assert jax.process_count() == nprocs, (
        f"process_count={jax.process_count()}, want {nprocs}"
    )
    assert jax.process_index() == proc_id

    sizes = SHARD_SIZES[:nprocs]
    total = sum(sizes)
    start = sum(sizes[:proc_id])
    mine = [
        {"question_id": start + i, "answer": f"ans{start + i}"}
        for i in range(sizes[proc_id])
    ]

    from explicit_alignment_for_vqa_tasks_tpu.parallel.gather import (
        gather_predictions_to_host0,
    )

    merged = gather_predictions_to_host0(mine)

    qids = sorted(p["question_id"] for p in merged)
    assert qids == list(range(total)), (
        f"gather dropped/duplicated shards: {qids}"
    )

    if jax.process_index() == 0:
        # the official protocol's integration check: predictions must
        # cover exactly the annotated question-id set
        vqa = build_vqa(total, tmpdir)
        res = vqa.load_res_from_list(merged)
        assert len(res.dataset["annotations"]) == total
        with open(os.path.join(tmpdir, "host0_ok"), "w") as fh:
            fh.write(f"gathered={len(merged)}\n")

    print(f"worker {proc_id}/{nprocs} OK: gathered {len(merged)}")


if __name__ == "__main__":
    main()
