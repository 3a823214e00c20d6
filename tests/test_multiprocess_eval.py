"""MULTI-PROCESS flagship EVAL e2e (VERDICT r2 missing #2).

The gather primitive and the training step were already tested across
real processes; this runs the FewShotVQAExecutor ITSELF across 2
processes: per-process [i::P] dataset shard -> _generative_step ->
gather_predictions_to_host0 -> official VQA scoring, asserting the
full-coverage invariant (reference: src/utils/vqa_tools.py:224-225) and
score equality with a single-process run on the same fixtures.
"""

import json
import os
import pickle
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "eval_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["bf16", "int8"])
def test_two_process_flagship_eval(tmp_path, mode):
    """mode=int8 additionally pins the distributed-calibration contract:
    each worker calibrates SmoothQuant stats on its OWN [i::P] shard, the
    stats are max-reduced across processes, so the quantized weights —
    and the predictions — must EQUAL the single-process run that
    calibrates over the same union of questions."""
    # --- single-process reference run (this pytest process, cpu) ---
    from test_e2e import build_executor, make_test_config, write_vqa_fixtures

    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    fixtures = write_vqa_fixtures(ref_dir)
    config = make_test_config(ref_dir, fixtures)
    config.tpu.use_mesh = False
    if mode == "int8":
        config.tpu.fused_attention = True
        config.tpu.int8_encoder_ffn = True
        config.tpu.int8_encoder_attn = True
        config.tpu.int8_calibrate_batches = 2  # all 4 questions
    executor = build_executor(config)
    ref_metrics = executor.test()
    with open(os.path.join(config.results_path, "answers.pkl"), "rb") as fh:
        ref_predictions = pickle.load(fh)

    workdir = tmp_path / "mp"
    workdir.mkdir()
    with open(workdir / "fixtures.json", "w") as fh:
        json.dump(fixtures, fh)
    with open(workdir / "expected.json", "w") as fh:
        json.dump({
            "accuracy_overall":
                ref_metrics["test_evaluation/accuracy_overall"],
            "total_questions": len(ref_predictions),
            "question_ids": [p["question_id"] for p in ref_predictions],
        }, fh)

    # --- 2-process executor-driven run on the SAME fixture files ---
    nprocs = 2
    port = _free_port()
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        for key in list(env):
            if key.startswith(("PJRT_", "TPU_", "AXON_", "_AXON",
                               "PALLAS_AXON")):
                del env[key]
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(nprocs)
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(nprocs),
                 str(workdir), mode],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=600)
        outputs.append(out)
    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, (
            f"worker {pid} failed rc={proc.returncode}:\n{out}"
        )
        assert f"eval worker {pid}/{nprocs} OK" in out
    assert (workdir / "eval_host0_ok").exists()
