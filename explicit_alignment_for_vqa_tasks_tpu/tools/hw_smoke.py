"""On-chip hardware smoke: run the product paths on the REAL TPU.

The pytest suite forces an 8-device virtual CPU mesh (tests/conftest.py),
so this script exists to re-validate the same end-to-end flows on actual
TPU hardware with the production compute dtype (bf16):

  1. flagship few-shot VQA eval (data loading -> ModuleParser -> prefix
     splice -> encoder -> KV-cache greedy decode -> official VQA scoring
     -> answers.pkl), reference flow: src/main.py + few_shot_vqa_executor;
  2. CC mapper training (captioning loss, optax step, Orbax checkpoint)
     + epoch resume;
  3. the int8 bulk-eval stack with deferred SmoothQuant calibration
     (tpu.int8_encoder_ffn/attn + int8_calibrate_batches): the grouped
     q8 kernels must compile and run on real Mosaic, and the
     calibrate -> quantize -> eval flow must produce full coverage.

Reuses the committed e2e fixture builders (tests/test_e2e.py) so the
fixtures are identical to CI's. Run manually:  python -m
explicit_alignment_for_vqa_tasks_tpu.tools.hw_smoke
"""

from __future__ import annotations

import os
import pickle
import sys
import tempfile
from pathlib import Path


def main() -> None:
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(repo_root, "tests"))
    sys.path.insert(0, repo_root)

    # before first backend use (harmless at the smoke's tiny widths, but
    # keeps the script valid if pointed at production shapes)
    from explicit_alignment_for_vqa_tasks_tpu.utils.tpu_flags import (
        ensure_scoped_vmem_limit,
    )

    ensure_scoped_vmem_limit(98304)

    import jax

    print(f"hw_smoke on: {jax.devices()[0]}", flush=True)

    import test_e2e as e2e
    from explicit_alignment_for_vqa_tasks_tpu.trainers.checkpointing import (
        save_checkpoint,
    )

    # ---- 1. flagship few-shot VQA eval, bf16 compute ----
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        fixtures = e2e.write_vqa_fixtures(tmp)
        config = e2e.make_test_config(tmp, fixtures)
        config.tpu.compute_dtype = "bfloat16"
        config.tpu.params_dtype = "bfloat16"
        executor = e2e.build_executor(config)
        save_checkpoint(config.saved_model_path, 0,
                        executor.trainable_state())
        executor.maybe_load_checkpoint()
        metrics = executor.test()
        acc = metrics["test_evaluation/accuracy_overall"]
        assert 0.0 <= acc <= 100.0, metrics
        answers_path = os.path.join(config.results_path, "answers.pkl")
        with open(answers_path, "rb") as fh:
            predictions = pickle.load(fh)
        assert len(predictions) == 4, len(predictions)
        print(f"hw_smoke eval OK: accuracy_overall={acc:.2f}, "
              f"predictions={len(predictions)}", flush=True)

    # ---- 1b. the exotic eval modes on the real chip: blockwise
    # one-at-a-time encoder (round-3: ONE stacked encode) and beam ----
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        fixtures = e2e.write_vqa_fixtures(tmp)
        config = e2e.make_test_config(
            tmp, fixtures, pass_examples_through_encoder_one_at_a_time=1,
        )
        config.tpu.compute_dtype = "bfloat16"
        config.tpu.params_dtype = "bfloat16"
        executor = e2e.build_executor(config)
        metrics = executor.test()
        assert 0.0 <= metrics["test_evaluation/accuracy_overall"] <= 100.0
        print("hw_smoke one-at-a-time eval OK", flush=True)
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        fixtures = e2e.write_vqa_fixtures(tmp)
        config = e2e.make_test_config(tmp, fixtures, num_beams=2)
        config.tpu.compute_dtype = "bfloat16"
        config.tpu.params_dtype = "bfloat16"
        executor = e2e.build_executor(config)
        metrics = executor.test()
        assert 0.0 <= metrics["test_evaluation/accuracy_overall"] <= 100.0
        print("hw_smoke beam eval OK", flush=True)
    # batched ensemble members (tpu.ensemble_members_per_call): the
    # looped and batched paths must produce identical answers on real
    # Mosaic, not just the CPU mesh
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        fixtures = e2e.write_vqa_fixtures(tmp)
        answers = []
        for m in (1, 2):
            config = e2e.make_test_config(
                tmp, fixtures, num_permutations_of_in_context_examples=3,
            )
            config.tpu.compute_dtype = "bfloat16"
            config.tpu.params_dtype = "bfloat16"
            config.tpu.ensemble_members_per_call = m
            executor = e2e.build_executor(config)
            executor.test()
            with open(os.path.join(config.results_path, "answers.pkl"),
                      "rb") as fh:
                answers.append(pickle.load(fh))
        assert answers[0] == answers[1], "batched != looped ensembles"
        print("hw_smoke batched-ensembles eval OK (== looped)", flush=True)

    # ---- 2. CC mapper training + checkpoint + resume, bf16 compute ----
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        helper = e2e.TestConceptualCaptionsTraining()
        config = helper.make_cc_config(tmp)
        config.tpu.compute_dtype = "bfloat16"
        config.tpu.params_dtype = "bfloat16"
        config.train.epochs = 1
        executor = e2e.build_executor(config)
        executor.train()
        ckpt = os.path.join(config.saved_model_path, "model_00")
        assert os.path.exists(ckpt), ckpt
        # resume into a fresh executor
        executor2 = e2e.build_executor(config)
        executor2.maybe_load_checkpoint()
        print("hw_smoke train+resume OK", flush=True)

    # ---- 3. int8 eval stack with deferred SmoothQuant calibration ----
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        fixtures = e2e.write_vqa_fixtures(tmp)
        config = e2e.make_test_config(tmp, fixtures)
        config.tpu.compute_dtype = "bfloat16"
        config.tpu.params_dtype = "bfloat16"
        config.tpu.fused_attention = True
        config.tpu.int8_encoder_ffn = True
        config.tpu.int8_encoder_attn = True
        config.tpu.int8_cross_kv = True
        config.tpu.int8_calibrate_batches = 1
        executor = e2e.build_executor(config)
        assert executor.model.pending_int8_calibration
        metrics = executor.test()
        acc = metrics["test_evaluation/accuracy_overall"]
        assert 0.0 <= acc <= 100.0, metrics
        enc = executor.model.params["lm"]["encoder"]
        assert "ln" in enc["ffn_q8"] and "ln" in enc["self_attn_q8"]
        with open(os.path.join(config.results_path, "answers.pkl"),
                  "rb") as fh:
            assert len(pickle.load(fh)) == 4
        print(f"hw_smoke int8 calibrated eval OK: "
              f"accuracy_overall={acc:.2f}", flush=True)

    print("hw_smoke PASSED", flush=True)


if __name__ == "__main__":
    main()
