"""CI twin of the real-weights replication harness (VERDICT r2 #4).

tools/replicate_baseline.py is the one-command check a user runs once
T0-3B weights + VQA2 artifacts are mounted (zero-egress blocks them
here). This test runs the HARNESS itself end-to-end with tiny weights: a
saved tiny HF T5 checkpoint (+ the committed subword tokenizer fixture
as its tokenizer), a reference-style torch mapper .ckpt (converted on
the fly), and synthetic VQA2 artifacts — so the harness is proven to
work on day 1.
"""

import json
import os
import shutil

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_e2e import write_vqa_fixtures  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOK_FIXTURE = os.path.join(REPO, "tests", "fixtures", "tiny_t5_tokenizer")

PREFIX_SIZE = 16   # matches write_vqa_fixtures' embedding width
PREFIX_LEN = 2
D_MODEL = 32


@pytest.fixture(scope="module")
def tiny_weights_dir(tmp_path_factory):
    """A local 'HF checkpoint dir': tiny T5 model + the committed subword
    tokenizer (vocab 229, sentinel base 228)."""
    out = tmp_path_factory.mktemp("tiny_t0")
    hf_cfg = transformers.T5Config(
        vocab_size=256,  # >= tokenizer vocab (229)
        d_model=D_MODEL, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        dropout_rate=0.0, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(3)
    model = transformers.T5ForConditionalGeneration(hf_cfg)
    model.save_pretrained(out)
    for name in os.listdir(TOK_FIXTURE):
        shutil.copy(os.path.join(TOK_FIXTURE, name), out / name)
    return str(out)


@pytest.fixture(scope="module")
def tiny_mapper_ckpt(tmp_path_factory):
    """Reference-style PL checkpoint: model.clip_project.* MLP weights
    (torch Linear layout, reference: src/models/vct0.py:58-69)."""
    out = tmp_path_factory.mktemp("ckpt") / "model_00.ckpt"
    hidden = (D_MODEL * PREFIX_LEN) // 2
    torch.manual_seed(4)
    state_dict = {
        "model.clip_project.model.0.weight":
            torch.randn(hidden, PREFIX_SIZE),
        "model.clip_project.model.0.bias": torch.randn(hidden),
        "model.clip_project.model.2.weight":
            torch.randn(D_MODEL * PREFIX_LEN, hidden),
        "model.clip_project.model.2.bias":
            torch.randn(D_MODEL * PREFIX_LEN),
    }
    torch.save({"state_dict": state_dict}, out)
    return str(out)


def _harness_argv(weights, ckpt, fixtures, workdir, shots, output):
    return [
        "--t0-weights", weights,
        "--mapper-ckpt", ckpt,
        "--questions-train", fixtures["train_q"],
        "--annotations-train", fixtures["train_a"],
        "--questions-val", fixtures["val_q"],
        "--annotations-val", fixtures["val_a"],
        "--clip-embeddings-train", fixtures["embeddings"],
        "--clip-embeddings-val", fixtures["embeddings"],
        "--rices", fixtures["rices"],
        "--shots", *[str(s) for s in shots],
        "--templates", "hotpotqa",
        "--batch-size", "2",
        "--compute-dtype", "float32", "--params-dtype", "float32",
        "--fused-attention", "0",
        "--workdir", str(workdir),
        "--output", str(output),
        "--opts",
        f"model_config.model_args.prefix_size={PREFIX_SIZE}",
        f"model_config.model_args.prefix_length={PREFIX_LEN}",
        "data_loader.additional.max_target_length=8",
    ]


@pytest.mark.slow
def test_harness_end_to_end_tiny_weights(tmp_path, tiny_weights_dir,
                                         tiny_mapper_ckpt):
    from explicit_alignment_for_vqa_tasks_tpu.tools.replicate_baseline import (
        main,
    )

    os.chdir(REPO)
    fixtures = write_vqa_fixtures(tmp_path)
    report_path = tmp_path / "report.json"
    rc = main(_harness_argv(
        tiny_weights_dir, tiny_mapper_ckpt, fixtures, tmp_path / "work",
        shots=[0, 2], output=report_path,
    ))
    assert rc == 0  # non-strict: FAIL verdicts don't flip the exit code
    with open(report_path) as fh:
        report = json.load(fh)
    assert not report["random_mapper"]
    assert len(report["rows"]) == 2
    for row in report["rows"]:
        assert row["template"] == "hotpotqa"
        assert row["questions"] == 4
        assert 0.0 <= row["accuracy"] <= 100.0
        assert row["reference"] == {0: 34.49, 2: 39.66}[row["num_shots"]]
        assert row["verdict"] in ("PASS", "FAIL")
        assert np.isclose(row["delta"],
                          round(row["accuracy"] - row["reference"], 2))
    assert isinstance(report["all_pass"], bool)


@pytest.mark.slow
def test_harness_compare_bf16(tmp_path, tiny_weights_dir,
                              tiny_mapper_ckpt):
    """--compare-bf16 (VERDICT r4 #6): one invocation runs each point
    with the int8 --opts AND with them stripped, reporting the
    int8-vs-bf16 delta with a ±tolerance verdict — the day-1 int8
    validation as one command."""
    from explicit_alignment_for_vqa_tasks_tpu.tools.replicate_baseline import (
        main,
        parse_args,
        run_sweep,
    )

    os.chdir(REPO)
    fixtures = write_vqa_fixtures(tmp_path)
    report_path = tmp_path / "report.json"
    argv = _harness_argv(
        tiny_weights_dir, tiny_mapper_ckpt, fixtures, tmp_path / "work",
        shots=[1], output=report_path,
    )
    argv += ["--compare-bf16", "--opts",
             f"model_config.model_args.prefix_size={PREFIX_SIZE}",
             f"model_config.model_args.prefix_length={PREFIX_LEN}",
             "data_loader.additional.max_target_length=8",
             "tpu.int8_encoder_ffn=1"]
    rc = main(argv)
    assert rc == 0
    with open(report_path) as fh:
        report = json.load(fh)
    row = report["rows"][0]
    assert "accuracy_bf16" in row and "int8_vs_bf16_delta" in row
    assert row["int8_verdict"] in ("PASS", "FAIL")
    assert np.isclose(
        row["int8_vs_bf16_delta"],
        round(row["accuracy"] - row["accuracy_bf16"], 2),
    )

    # --compare-bf16 without int8 opts is refused loudly
    args = parse_args(_harness_argv(
        tiny_weights_dir, tiny_mapper_ckpt, fixtures, tmp_path / "w2",
        shots=[1], output=tmp_path / "r2.json",
    ) + ["--compare-bf16"])
    with pytest.raises(ValueError, match="tpu.int8"):
        run_sweep(args)


@pytest.mark.slow
def test_harness_deterministic(tmp_path, tiny_weights_dir,
                               tiny_mapper_ckpt):
    """Two runs on the same artifacts must agree exactly (the parity
    verdict is meaningless otherwise)."""
    from explicit_alignment_for_vqa_tasks_tpu.tools.replicate_baseline import (
        main,
    )

    os.chdir(REPO)
    fixtures = write_vqa_fixtures(tmp_path)
    accs = []
    for run in range(2):
        report_path = tmp_path / f"report{run}.json"
        rc = main(_harness_argv(
            tiny_weights_dir, tiny_mapper_ckpt, fixtures,
            tmp_path / f"work{run}", shots=[1], output=report_path,
        ))
        assert rc == 0
        with open(report_path) as fh:
            accs.append(json.load(fh)["rows"][0]["accuracy"])
    assert accs[0] == accs[1]


@pytest.mark.slow
def test_harness_published_table_modes(tmp_path, tiny_weights_dir,
                                       tiny_mapper_ckpt):
    """--modes covers the REST of the published table (notebook cells
    5-7): text-only prompts, question-only RICES, RANDOM examples, and
    prompt-permutation ensembling — each mapped to its published
    hotpotqa-template baselines."""
    from explicit_alignment_for_vqa_tasks_tpu.tools.replicate_baseline import (
        main,
    )

    os.chdir(REPO)
    fixtures = write_vqa_fixtures(tmp_path)
    report_path = tmp_path / "report.json"
    argv = _harness_argv(
        tiny_weights_dir, tiny_mapper_ckpt, fixtures, tmp_path / "work",
        shots=[1], output=report_path,
    )
    # the fixtures' rices pickle doubles as the random/text-rices
    # artifacts (identical schema)
    argv += ["--modes", "no_prefix", "text_rices", "random",
             "--random-examples", fixtures["rices"],
             "--text-rices", fixtures["rices"],
             "--templates", "hotpotqa"]
    rc = main(argv)
    assert rc == 0
    with open(report_path) as fh:
        report = json.load(fh)
    refs = {row["mode"]: row["reference"] for row in report["rows"]}
    assert refs == {"no_prefix": 38.08, "text_rices": 32.94,
                    "random": 24.93}
    for row in report["rows"]:
        assert 0.0 <= row["accuracy"] <= 100.0

    # ensembling needs k >= 2; run it separately with 2 permutations
    report_path2 = tmp_path / "report2.json"
    argv2 = _harness_argv(
        tiny_weights_dir, tiny_mapper_ckpt, fixtures, tmp_path / "work2",
        shots=[2], output=report_path2,
    )
    argv2 += ["--modes", "ensemble", "--ensemble-permutations", "2"]
    rc = main(argv2)
    assert rc == 0
    with open(report_path2) as fh:
        report2 = json.load(fh)
    assert len(report2["rows"]) == 1
    assert report2["rows"][0]["mode"] == "ensemble"
    assert report2["rows"][0]["reference"] == 40.34


@pytest.mark.slow
def test_harness_unpublished_shots_raise(tmp_path, tiny_weights_dir,
                                         tiny_mapper_ckpt):
    """--shots values outside a requested mode's published table are
    dropped (an 'n/a' row would count as passing under --strict); if
    nothing remains the harness fails loudly."""
    from explicit_alignment_for_vqa_tasks_tpu.tools.replicate_baseline import (
        main,
    )

    os.chdir(REPO)
    fixtures = write_vqa_fixtures(tmp_path)
    argv = _harness_argv(
        tiny_weights_dir, tiny_mapper_ckpt, fixtures, tmp_path / "work",
        shots=[0], output=tmp_path / "r.json",
    )
    argv += ["--modes", "ensemble"]  # ensemble publishes k in {2, 4} only
    with pytest.raises(ValueError, match="no published points"):
        main(argv)


@pytest.mark.slow
def test_harness_mode_missing_artifact_raises(tmp_path, tiny_weights_dir,
                                              tiny_mapper_ckpt):
    """Explicitly requested modes with missing artifacts must fail loudly,
    not silently reuse the wrong example pickle."""
    from explicit_alignment_for_vqa_tasks_tpu.tools.replicate_baseline import (
        main,
    )

    os.chdir(REPO)
    fixtures = write_vqa_fixtures(tmp_path)
    argv = _harness_argv(
        tiny_weights_dir, tiny_mapper_ckpt, fixtures, tmp_path / "work",
        shots=[1], output=tmp_path / "r.json",
    )
    argv += ["--modes", "random"]  # no --random-examples
    # the up-front artifact checklist now catches this before the sweep
    with pytest.raises((ValueError, FileNotFoundError),
                       match="--random-examples"):
        main(argv)


@pytest.mark.slow
def test_harness_with_int8_opts(tmp_path, tiny_weights_dir,
                                tiny_mapper_ckpt):
    """The documented int8 accuracy-validation invocation: the harness
    must run the sweep with the opt-in int8 modes enabled through --opts
    (this is the command a user runs before enabling them in production
    — see tools/int8_drift_study.py)."""
    from explicit_alignment_for_vqa_tasks_tpu.tools.replicate_baseline import (
        main,
    )

    os.chdir(REPO)
    fixtures = write_vqa_fixtures(tmp_path)
    report_path = tmp_path / "report.json"
    argv = _harness_argv(
        tiny_weights_dir, tiny_mapper_ckpt, fixtures, tmp_path / "work",
        shots=[0], output=report_path,
    )
    argv += ["tpu.int8_cross_kv=True", "tpu.int8_encoder_ffn=True",
             "tpu.int8_encoder_attn=True", "tpu.fused_attention=True"]
    rc = main(argv)
    assert rc == 0
    with open(report_path) as fh:
        report = json.load(fh)
    assert len(report["rows"]) == 1
    assert 0.0 <= report["rows"][0]["accuracy"] <= 100.0
    # int8 opts present -> the trained-weight drift study ran by default
    # in a child process and landed in the report (VERDICT r4 #6)
    drift = report["int8_drift_study"]
    assert isinstance(drift, dict) and "trained" in drift
    assert drift["weights"] == tiny_weights_dir


@pytest.mark.slow
def test_harness_skip_int8_drift(tmp_path, tiny_weights_dir,
                                 tiny_mapper_ckpt):
    from explicit_alignment_for_vqa_tasks_tpu.tools.replicate_baseline import (
        main,
    )

    os.chdir(REPO)
    fixtures = write_vqa_fixtures(tmp_path)
    report_path = tmp_path / "report.json"
    argv = _harness_argv(
        tiny_weights_dir, tiny_mapper_ckpt, fixtures, tmp_path / "work",
        shots=[0], output=report_path,
    )
    argv += ["tpu.int8_encoder_ffn=True"]
    argv.insert(0, "--skip-int8-drift")
    assert main(argv) == 0
    with open(report_path) as fh:
        report = json.load(fh)
    assert report["int8_drift_study"] == "skipped (--skip-int8-drift)"


@pytest.mark.slow
def test_harness_missing_artifact_checklist(tmp_path, tiny_weights_dir,
                                            tiny_mapper_ckpt):
    """A half-mounted artifact set must fail up front with the FULL
    shopping list, not a deep loader traceback (VERDICT r4 #6)."""
    from explicit_alignment_for_vqa_tasks_tpu.tools.replicate_baseline import (
        main,
    )

    os.chdir(REPO)
    fixtures = write_vqa_fixtures(tmp_path)
    argv = _harness_argv(
        tiny_weights_dir, tiny_mapper_ckpt, fixtures, tmp_path / "work",
        shots=[0], output=tmp_path / "report.json",
    )
    argv[argv.index("--rices") + 1] = str(tmp_path / "nope_rices.pkl")
    argv[argv.index("--questions-val") + 1] = str(tmp_path / "nope_q.json")
    with pytest.raises(FileNotFoundError) as err:
        main(argv)
    msg = str(err.value)
    assert "--rices" in msg and "--questions-val" in msg


@pytest.mark.slow
def test_replicate_dryrun_tool(tmp_path):
    """make replicate-dryrun's engine: builds every tiny artifact itself
    and drives the harness through the published-table layout."""
    from explicit_alignment_for_vqa_tasks_tpu.tools.replicate_dryrun import (
        main,
    )

    os.chdir(REPO)
    rc = main(["--workdir", str(tmp_path / "dry"), "--modes", "main",
               "--shots", "0", "--no-int8"])
    assert rc == 0
    with open(tmp_path / "dry" / "dryrun_report.json") as fh:
        report = json.load(fh)
    # main mode x {hotpotqa, frozen} x k=0
    assert {(r["template"], r["num_shots"]) for r in report["rows"]} == \
        {("hotpotqa", 0), ("frozen", 0)}
    assert all(r["accuracy"] is not None for r in report["rows"])

    # the loud-checklist demo path
    rc = main(["--workdir", str(tmp_path / "poke"), "--modes", "main",
               "--shots", "0", "--no-int8", "--poke-missing"])
    assert rc == 0
