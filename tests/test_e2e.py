"""End-to-end tests: the flagship few-shot VQA eval path and CC mapper
training, on tiny synthetic fixtures with a small random T5."""

import argparse
import json
import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers

from explicit_alignment_for_vqa_tasks_tpu.main import main as run_main  # noqa: E402
from explicit_alignment_for_vqa_tasks_tpu.registry import (  # noqa: E402
    DATA_LOADERS,
    EXECUTORS,
)
from explicit_alignment_for_vqa_tasks_tpu.trainers.checkpointing import (  # noqa: E402
    save_checkpoint,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.attr_dict import AttrDict  # noqa: E402
from explicit_alignment_for_vqa_tasks_tpu.utils.config_system import (  # noqa: E402
    process_config,
)

PREFIX_SIZE = 16


def write_vqa_fixtures(tmp_path, n_train_imgs=6, n_val_imgs=4):
    """Synthetic VQA2 artifacts in the reference's file formats."""
    rng = np.random.default_rng(0)
    data_dir = tmp_path / "data"
    data_dir.mkdir(exist_ok=True)

    def make_split(name, n_imgs, qid_base):
        questions, annotations = [], []
        for i in range(n_imgs):
            img_id = qid_base // 1000 + i
            qid = qid_base + i
            questions.append({
                "question_id": qid, "image_id": img_id,
                "question": f"what color is object {i} ?",
            })
            answer = ["red", "blue", "green"][i % 3]
            annotations.append({
                "question_id": qid, "image_id": img_id,
                "question_type": "what color is",
                "answer_type": "other",
                "multiple_choice_answer": answer,
                "answers": [
                    {"answer": answer, "answer_confidence": "yes",
                     "answer_id": k + 1} for k in range(10)
                ],
            })
        q_file = data_dir / f"{name}_questions.json"
        a_file = data_dir / f"{name}_annotations.json"
        q_file.write_text(json.dumps({
            "info": {}, "task_type": "Open-Ended", "data_type": "mscoco",
            "data_subtype": name, "license": {}, "questions": questions,
        }))
        a_file.write_text(json.dumps({
            "info": {}, "task_type": "Open-Ended", "data_type": "mscoco",
            "data_subtype": name, "license": {}, "annotations": annotations,
        }))
        return q_file, a_file, questions, annotations

    train_q, train_a, train_qs, _ = make_split("train2014", n_train_imgs,
                                               1000000)
    val_q, val_a, val_qs, _ = make_split("val2014", n_val_imgs, 2000000)

    # CLIP embedding pickles keyed by str(img_key)
    all_img_ids = (
        [q["image_id"] for q in train_qs] + [q["image_id"] for q in val_qs]
    )
    embeddings = {
        str(img_id): rng.standard_normal((1, PREFIX_SIZE)).astype(np.float32)
        for img_id in all_img_ids
    }
    emb_file = data_dir / "clip_embeddings.pkl"
    emb_file.write_bytes(pickle.dumps(embeddings))

    # in-context examples: ascending similarity (best LAST)
    rices = {}
    for q in val_qs:
        rices[str(q["question_id"])] = [
            {
                "question_id": tq["question_id"],
                "img_key": tq["image_id"],
                "question": tq["question"],
                "gold_answer": ["red", "blue", "green"][i % 3],
            }
            for i, tq in enumerate(train_qs)
        ]
    rices_file = data_dir / "rices.pkl"
    rices_file.write_bytes(pickle.dumps(rices))
    return dict(
        train_q=str(train_q), train_a=str(train_a),
        val_q=str(val_q), val_a=str(val_a),
        embeddings=str(emb_file), rices=str(rices_file),
    )


def use_fixture_tokenizer(config):
    """Switch a test config from SimpleTokenizer to the committed REAL
    subword tokenizer fixture (T5TokenizerFast, Unigram+Metaspace, T5
    special-token layout — tests/fixtures/tiny_t5_tokenizer). The
    prefix-splice sentinel base follows the fixture's <extra_id_0> id."""
    fixture_dir = os.path.join(REPO_ROOT, "tests", "fixtures",
                               "tiny_t5_tokenizer")
    with open(os.path.join(fixture_dir, "fixture_meta.json")) as fh:
        meta = json.load(fh)
    config.model_config.TokenizerClass = "T5TokenizerFast"
    config.model_config.TokenizerModelVersion = fixture_dir
    config.model_config.model_args.sentinel_base = meta["sentinel_base"]
    return config


def make_test_config(tmp_path, fixtures, **extra_additional):
    args = argparse.Namespace(
        config="configs/vqa2/few_shot_vqa_hotpotqa.jsonnet",
        mode="test", experiment_name="e2e_test", reset=False,
        num_shots=2, no_prefix=0,
        pass_examples_through_encoder_one_at_a_time=0,
        num_permutations_of_in_context_examples=0,
        sample_templates=0, ensemble_one_shots=0,
        in_context_examples_fpath=fixtures["rices"],
        modules=[], tags=[], test_batch_size=2, test_evaluation_name="",
        opts=[],
    )
    import os

    os.chdir(REPO_ROOT)
    config = process_config(args)
    config.EXPERIMENT_FOLDER = str(tmp_path / "experiments")
    config.TENSORBOARD_FOLDER = str(tmp_path / "tb")
    config.experiment_path = str(tmp_path / "experiments" / "e2e_test")
    config.saved_model_path = str(
        tmp_path / "experiments" / "e2e_test" / "train" / "saved_model"
    )
    config.results_path = str(
        tmp_path / "experiments" / "e2e_test" / "test" / "test_evaluation"
    )
    config.cache.default_folder = str(tmp_path / "cache")
    # tiny model + offline tokenizer
    config.model_config.TokenizerClass = "SimpleTokenizer"
    config.model_config.ConfigClass = "T5_test"
    config.model_config.lm_config = {
        "d_model": 32, "d_kv": 8, "num_heads": 4, "d_ff": 64,
        "num_encoder_layers": 2, "num_decoder_layers": 2,
        "relative_attention_num_buckets": 8,
        "relative_attention_max_distance": 16,
    }
    config.model_config.pretrained = 0
    config.model_config.model_args.prefix_size = PREFIX_SIZE
    config.model_config.model_args.prefix_length = 2
    config.tpu.compute_dtype = "float32"
    config.tpu.params_dtype = "float32"
    config.tpu.length_buckets = [64, 128, 256]
    config.data_loader.additional.max_source_length = 256
    config.data_loader.additional.max_target_length = 8
    config.valid.batch_size = 2
    # point data paths at fixtures
    module_dict = config.data_loader.dataset_modules.module_dict
    module_dict.LoadVQA2Data.config.vqa_data_path = AttrDict(
        question_files={"train": fixtures["train_q"],
                        "val": fixtures["val_q"]},
        annotation_files={"train": fixtures["train_a"],
                          "val": fixtures["val_a"]},
    )
    module_dict.LoadVQA2Data.config.image_data_path = AttrDict(
        train=str(tmp_path), val=str(tmp_path)
    )
    module_dict.LoadClipEmbeddings.config = AttrDict(
        train=fixtures["embeddings"], val=fixtures["embeddings"],
    )
    for key, value in extra_additional.items():
        config.data_loader.additional[key] = value
    return config


import os  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_executor(config):
    data_loader = DATA_LOADERS.get(config.data_loader.type)(config)
    data_loader.build_dataset()
    data_loader.set_dataloader()
    executor = EXECUTORS.get(config.train.type)(config, data_loader)
    return executor


class TestFewShotVQAEndToEnd:
    @pytest.mark.parametrize("tokenizer", ["simple", "sentencepiece"])
    def test_flagship_eval_path(self, tmp_path, tokenizer):
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(tmp_path, fixtures)
        if tokenizer == "sentencepiece":
            config = use_fixture_tokenizer(config)
        executor = build_executor(config)
        # save + load a checkpoint like a real run
        save_checkpoint(config.saved_model_path, 0,
                        executor.trainable_state())
        executor.maybe_load_checkpoint()
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics
        assert 0.0 <= metrics["test_evaluation/accuracy_overall"] <= 100.0
        # predictions written by write_predictions_to_file
        answers_path = os.path.join(config.results_path, "answers.pkl")
        assert os.path.exists(answers_path)
        with open(answers_path, "rb") as fh:
            predictions = pickle.load(fh)
        assert len(predictions) == 4  # every val question exactly once

    def test_int8_encoder_ffn_eval(self, tmp_path):
        """tpu.int8_encoder_ffn runs the flagship eval end-to-end: the
        factory quantizes the frozen LM's FFN once at build time and the
        executor's generate path dispatches to fused_t5_ffn_q8 (opt-in
        bulk-eval mode, round 3)."""
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(tmp_path, fixtures)
        config.tpu.int8_encoder_ffn = True
        config.tpu.int8_encoder_attn = True
        config.tpu.fused_attention = True  # int8_encoder_attn requires it
        executor = build_executor(config)
        lm_params = executor.model.params["lm"]
        assert "ffn_q8" in lm_params["encoder"]
        assert "self_attn_q8" in lm_params["encoder"]
        assert executor.model.cfg.lm.int8_encoder_ffn
        assert executor.model.cfg.lm.int8_encoder_attn
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics
        assert 0.0 <= metrics["test_evaluation/accuracy_overall"] <= 100.0

    def test_int8_decoder_step_eval(self, tmp_path):
        """tpu.int8_decoder_step runs the flagship eval end-to-end: the
        factory quantizes the decode-step matmul weights once at build
        time (weight-only, drop_bf16 — the bf16 decoder copies are
        removed) and every generate path decodes through the int8
        weights."""
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(tmp_path, fixtures)
        config.tpu.int8_decoder_step = True
        executor = build_executor(config)
        lm_params = executor.model.params["lm"]
        assert "step_q8" in lm_params["decoder"]
        assert "q" not in lm_params["decoder"]["self_attn"]  # dropped
        assert {"k", "v"} <= set(lm_params["decoder"]["cross_attn"])
        assert executor.model.cfg.lm.int8_decoder_step
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics
        assert 0.0 <= metrics["test_evaluation/accuracy_overall"] <= 100.0

    def test_int8_calibrated_eval(self, tmp_path):
        """tpu.int8_calibrate_batches defers quantization to the
        executor, which accumulates SmoothQuant activation maxima on the
        first eval batches' SPLICED encoder inputs and then quantizes
        with calibrated folding (the smoothed norm rides inside the q8
        subtrees)."""
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(tmp_path, fixtures)
        config.tpu.int8_encoder_ffn = True
        config.tpu.int8_encoder_attn = True
        config.tpu.fused_attention = True
        config.tpu.int8_calibrate_batches = 1
        executor = build_executor(config)
        # quantization deferred: nothing quantized at build time
        lm_params = executor.model.params["lm"]
        assert "ffn_q8" not in lm_params["encoder"]
        assert executor.model.pending_int8_calibration["batches"] == 1
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics
        assert 0.0 <= metrics["test_evaluation/accuracy_overall"] <= 100.0
        lm_params = executor.model.params["lm"]
        assert "ffn_q8" in lm_params["encoder"]
        assert "self_attn_q8" in lm_params["encoder"]
        # calibrated folding: the smoothed norms ride in the q8 subtrees
        assert "ln" in lm_params["encoder"]["ffn_q8"]
        assert "ln" in lm_params["encoder"]["self_attn_q8"]
        assert executor.model.pending_int8_calibration is None
        # predictions cover every question exactly once despite the
        # calibration pre-pass consuming a loader iteration
        answers_path = os.path.join(config.results_path, "answers.pkl")
        with open(answers_path, "rb") as fh:
            assert len(pickle.load(fh)) == 4

    def test_int8_calibration_unsupported_mode_raises(self, tmp_path):
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(
            tmp_path, fixtures,
            num_permutations_of_in_context_examples=2,
        )
        config.tpu.int8_encoder_ffn = True
        config.tpu.fused_attention = True
        config.tpu.int8_calibrate_batches = 1
        executor = build_executor(config)
        with pytest.raises(ValueError, match="int8_calibrate_batches"):
            executor.test()

    def test_zero_shot(self, tmp_path):
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(tmp_path, fixtures)
        config.data_loader.additional.num_shots = 0
        executor = build_executor(config)
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics

    def test_no_prefix(self, tmp_path):
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(tmp_path, fixtures)
        config.data_loader.additional.no_prefix = 1
        # no-prefix templates drop the sentinel slot
        config.model_config.input_modules.module_list[0].option = (
            "hotpotqa_no_prefix"
        )
        executor = build_executor(config)
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics

    def test_permutation_ensembling(self, tmp_path):
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(
            tmp_path, fixtures,
            num_permutations_of_in_context_examples=2,
        )
        executor = build_executor(config)
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics

    def test_batched_ensembles_match_looped(self, tmp_path):
        """tpu.ensemble_members_per_call = m stacks m ensemble members
        into the batch dimension per generate call (decode fixed costs
        amortize over m*B rows; one host sync per ceil(E/m) members).
        Members are row-independent, so predictions must match the
        reference-style per-member loop exactly — for even and uneven
        chunkings, in both ensemble modes, and under beam."""
        fixtures = write_vqa_fixtures(tmp_path)

        def run(members_per_call, **extra):
            config = make_test_config(tmp_path, fixtures, **extra)
            config.tpu.ensemble_members_per_call = members_per_call
            executor = build_executor(config)
            executor.test()
            path = os.path.join(config.results_path, "answers.pkl")
            with open(path, "rb") as fh:
                return pickle.load(fh)

        # permutation mode, E=3: m=2 exercises the uneven tail chunk,
        # m=3 the single-call path
        base = run(1, num_permutations_of_in_context_examples=3)
        assert run(2, num_permutations_of_in_context_examples=3) == base
        assert run(3, num_permutations_of_in_context_examples=3) == base
        # one-shot ensembling mode (E = num_shots = 2)
        base_os = run(1, ensemble_one_shots=1)
        assert run(2, ensemble_one_shots=1) == base_os
        # beam x batched ensembles
        base_beam = run(
            1, num_permutations_of_in_context_examples=3, num_beams=2
        )
        assert run(
            2, num_permutations_of_in_context_examples=3, num_beams=2
        ) == base_beam

    def test_permutation_ensembling_with_beam(self, tmp_path):
        """beam x ensemble composes: beam outputs carry true per-token
        logprobs (round-3 beam fix), so sequence_scores ranks ensemble
        members correctly and the executor forwards num_beams through
        generate_from_ensembles."""
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(
            tmp_path, fixtures,
            num_permutations_of_in_context_examples=2,
            num_beams=2,
        )
        executor = build_executor(config)
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics

    @pytest.mark.parametrize("tokenizer", ["simple", "sentencepiece"])
    def test_forced_decoder_prefix_eval(self, tmp_path, tokenizer):
        """decoder_generation mode: a left-padded decoder prompt is
        teacher-forced before greedy continuation
        (reference: vct0.py:466-482 + module_parser.py:397-399).
        Parameterized over the whitespace SimpleTokenizer AND the real
        subword fixture — left-padding side switching is exactly where a
        real tokenizer can diverge."""
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(tmp_path, fixtures)
        if tokenizer == "sentencepiece":
            config = use_fixture_tokenizer(config)
        config.model_config.decoder_input_modules = AttrDict(
            module_list=[
                {"type": "QuestionInput", "option": "default",
                 "separation_tokens": {"start": "", "end": ""}},
            ],
            postprocess_module_list=[
                {"type": "PostProcessInputTokenization",
                 "option": "decoder_generation"},
            ],
        )
        executor = build_executor(config)
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics

    def test_beam_search_eval(self, tmp_path):
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(tmp_path, fixtures, num_beams=2)
        executor = build_executor(config)
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics

    def test_one_at_a_time_encoder(self, tmp_path):
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(
            tmp_path, fixtures,
            pass_examples_through_encoder_one_at_a_time=1,
        )
        executor = build_executor(config)
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics

    def test_one_at_a_time_with_beam(self, tmp_path):
        """num_beams rides through the blockwise-encoder dispatch (the
        executor forwards it like every other mode)."""
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(
            tmp_path, fixtures,
            pass_examples_through_encoder_one_at_a_time=1,
            num_beams=2,
        )
        executor = build_executor(config)
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics


class TestCLITestMode:
    def test_cli_eval_with_checkpoint(self, tmp_path, monkeypatch):
        """Full CLI eval: checkpoint resolution + test run + answers.pkl."""
        from explicit_alignment_for_vqa_tasks_tpu.main import run

        fixtures = write_vqa_fixtures(tmp_path)
        # build an executor once just to produce a valid checkpoint
        config = make_test_config(tmp_path, fixtures)
        executor = build_executor(config)
        save_checkpoint(config.saved_model_path, 0,
                        executor.trainable_state())

        monkeypatch.chdir(REPO_ROOT)
        lm_cfg = ("{'d_model':32,'d_kv':8,'num_heads':4,'d_ff':64,"
                  "'num_encoder_layers':2,'num_decoder_layers':2,"
                  "'relative_attention_num_buckets':8,"
                  "'relative_attention_max_distance':16}")
        vqa_paths = (
            "{'question_files':{'train':'%s','val':'%s'},"
            "'annotation_files':{'train':'%s','val':'%s'}}"
        ) % (fixtures["train_q"], fixtures["val_q"],
             fixtures["train_a"], fixtures["val_a"])
        run([
            "configs/vqa2/few_shot_vqa_hotpotqa.jsonnet",
            "--mode", "test",
            "--experiment_name", "e2e_test",
            "--num_shots", "2",
            "--in_context_examples_fpath", fixtures["rices"],
            "--disable_wandb", "--disable_tensorboard",
            "--opts",
            f"EXPERIMENT_FOLDER={tmp_path}/experiments",
            f"TENSORBOARD_FOLDER={tmp_path}/tb",
            f"cache.default_folder={tmp_path}/cache",
            "model_config.TokenizerClass=SimpleTokenizer",
            "model_config.ConfigClass=T5_test",
            f"model_config.lm_config={lm_cfg}",
            "model_config.pretrained=0",
            f"model_config.model_args.prefix_size={PREFIX_SIZE}",
            "model_config.model_args.prefix_length=2",
            "tpu.compute_dtype=float32",
            "tpu.params_dtype=float32",
            "tpu.length_buckets=[64,128,256]",
            "data_loader.additional.max_source_length=256",
            "data_loader.additional.max_target_length=8",
            "valid.batch_size=2",
            "data_loader.dataset_modules.module_dict.LoadVQA2Data.config"
            f".vqa_data_path={vqa_paths}",
            "data_loader.dataset_modules.module_dict.LoadVQA2Data.config"
            f".image_data_path={{'train':'{tmp_path}','val':'{tmp_path}'}}",
            "data_loader.dataset_modules.module_dict.LoadClipEmbeddings"
            f".config={{'train':'{fixtures['embeddings']}',"
            f"'val':'{fixtures['embeddings']}'}}",
        ])
        results_dir = (
            f"{tmp_path}/experiments/e2e_test/test/test_evaluation"
        )
        assert os.path.exists(f"{results_dir}/answers.pkl")
        with open(f"{results_dir}/answers.pkl", "rb") as fh:
            assert len(pickle.load(fh)) == 4


class TestClipCapEndToEnd:
    def test_clipcap_train_and_eval(self, tmp_path):
        """ClipCap path: GPT-2 + mapper on VQA2 (QAInput training prompt,
        QInput generation prompt, answer-segment label masking)."""
        fixtures = write_vqa_fixtures(tmp_path)
        args = argparse.Namespace(
            config="configs/vqa2/clip_cap.jsonnet",
            mode="train", experiment_name="clipcap_e2e", reset=False,
            num_shots=0, no_prefix=0,
            pass_examples_through_encoder_one_at_a_time=0,
            num_permutations_of_in_context_examples=0,
            sample_templates=0, ensemble_one_shots=0,
            in_context_examples_fpath="", modules=[], tags=[],
            test_batch_size=-1, test_evaluation_name="", opts=[],
        )
        import os

        os.chdir(REPO_ROOT)
        config = process_config(args)
        config.EXPERIMENT_FOLDER = str(tmp_path / "experiments")
        config.saved_model_path = str(
            tmp_path / "experiments" / "clipcap_e2e" / "train" /
            "saved_model"
        )
        config.results_path = str(tmp_path / "results")
        config.cache.default_folder = str(tmp_path / "cache")
        config.model_config.TokenizerClass = "SimpleTokenizer"
        config.model_config.ConfigClass = "GPT2_test"
        # vocab must cover SimpleTokenizer's T5-style sentinel ids (QInput
        # emits <extra_id_0> into the GPT-2 prompt, as in the reference)
        config.model_config.lm_config = {
            "vocab_size": 33000, "n_positions": 128, "d_model": 32,
            "num_layers": 2, "num_heads": 4,
        }
        config.model_config.pretrained = 0
        config.model_config.model_args.prefix_size = PREFIX_SIZE
        config.model_config.model_args.prefix_length = 2
        config.tpu.compute_dtype = "float32"
        config.tpu.params_dtype = "float32"
        config.tpu.length_buckets = [32, 64]
        config.data_loader.additional.max_source_length = 64
        config.data_loader.additional.max_decoder_source_length = 64
        config.data_loader.additional.max_target_length = 8
        config.train.epochs = 1
        config.train.batch_size = 2
        config.valid.batch_size = 2
        config.valid.step_size = 0
        config.train.additional.gradient_accumulation_steps = 1
        module_dict = config.data_loader.dataset_modules.module_dict
        module_dict.LoadVQA2Data.config.vqa_data_path = AttrDict(
            question_files={"train": fixtures["train_q"],
                            "val": fixtures["val_q"]},
            annotation_files={"train": fixtures["train_a"],
                              "val": fixtures["val_a"]},
        )
        module_dict.LoadVQA2Data.config.image_data_path = AttrDict(
            train=str(tmp_path), val=str(tmp_path)
        )
        module_dict.LoadClipEmbeddings.config = AttrDict(
            train=fixtures["embeddings"], val=fixtures["embeddings"],
        )
        executor = build_executor(config)
        executor.train()
        # eval path produces full-coverage predictions
        config.mode = "test"
        metrics = executor.test()
        assert "test_evaluation/accuracy_overall" in metrics


class TestConceptualCaptionsTraining:
    def make_cc_config(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(1)
        n = 12
        table = pa.table({
            "image_url": [[f"http://img/{i}"] for i in range(n)],
            "caption": [[f"a photo of object {i} ."] for i in range(n)],
            "clip_embeddings": [
                rng.standard_normal(PREFIX_SIZE).astype(np.float32).tolist()
                for _ in range(n)
            ],
        })
        pq.write_table(table, tmp_path / "cc_train.parquet")
        pq.write_table(table, tmp_path / "cc_val.parquet")

        args = argparse.Namespace(
            config="configs/conceptual_captions/conceptual_captions.jsonnet",
            mode="train", experiment_name="cc_e2e", reset=False,
            num_shots=-1, no_prefix=0,
            pass_examples_through_encoder_one_at_a_time=0,
            num_permutations_of_in_context_examples=0,
            sample_templates=0, ensemble_one_shots=0,
            in_context_examples_fpath="", modules=[], tags=[],
            test_batch_size=-1, test_evaluation_name="", opts=[],
        )
        os.chdir(REPO_ROOT)
        config = process_config(args)
        config.EXPERIMENT_FOLDER = str(tmp_path / "experiments")
        config.saved_model_path = str(
            tmp_path / "experiments" / "cc_e2e" / "train" / "saved_model"
        )
        config.cache.default_folder = str(tmp_path / "cache")
        config.model_config.TokenizerClass = "SimpleTokenizer"
        config.model_config.ConfigClass = "T5_test"
        config.model_config.lm_config = {
            "d_model": 32, "d_kv": 8, "num_heads": 4, "d_ff": 64,
            "num_encoder_layers": 2, "num_decoder_layers": 2,
            "relative_attention_num_buckets": 8,
            "relative_attention_max_distance": 16,
        }
        config.model_config.pretrained = 0
        config.model_config.model_args.prefix_size = PREFIX_SIZE
        config.model_config.model_args.prefix_length = 2
        config.tpu.compute_dtype = "float32"
        config.tpu.params_dtype = "float32"
        config.train.epochs = 2
        config.train.batch_size = 4
        config.valid.batch_size = 4
        config.valid.step_size = 0
        config.train.additional.gradient_accumulation_steps = 1
        cc = config.data_loader.dataset_modules.module_dict
        cc.LoadConceptualCaptions.config = AttrDict(
            train=str(tmp_path / "cc_train.parquet"),
            val=str(tmp_path / "cc_val.parquet"),
        )
        return config

    def test_cli_train_smoke(self, tmp_path, monkeypatch):
        """Full CLI path: parse args -> init -> train one epoch."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from explicit_alignment_for_vqa_tasks_tpu.main import run

        rng = np.random.default_rng(2)
        n = 8
        table = pa.table({
            "image_url": [[f"http://img/{i}"] for i in range(n)],
            "caption": [[f"object {i} ."] for i in range(n)],
            "clip_embeddings": [
                rng.standard_normal(PREFIX_SIZE).astype(np.float32).tolist()
                for _ in range(n)
            ],
        })
        pq.write_table(table, tmp_path / "cc.parquet")
        monkeypatch.chdir(REPO_ROOT)
        lm_cfg = ("{'d_model':32,'d_kv':8,'num_heads':4,'d_ff':64,"
                  "'num_encoder_layers':2,'num_decoder_layers':2,"
                  "'relative_attention_num_buckets':8,"
                  "'relative_attention_max_distance':16}")
        run([
            "configs/conceptual_captions/conceptual_captions.jsonnet",
            "--mode", "train",
            "--experiment_name", "cli_smoke",
            "--disable_wandb", "--disable_tensorboard",
            "--opts",
            f"EXPERIMENT_FOLDER={tmp_path}/experiments",
            f"TENSORBOARD_FOLDER={tmp_path}/tb",
            f"cache.default_folder={tmp_path}/cache",
            "model_config.TokenizerClass=SimpleTokenizer",
            "model_config.ConfigClass=T5_test",
            f"model_config.lm_config={lm_cfg}",
            "model_config.pretrained=0",
            f"model_config.model_args.prefix_size={PREFIX_SIZE}",
            "model_config.model_args.prefix_length=2",
            "tpu.compute_dtype=float32",
            "tpu.params_dtype=float32",
            "train.epochs=1",
            "train.batch_size=4",
            "valid.batch_size=4",
            "valid.step_size=0",
            "train.additional.gradient_accumulation_steps=1",
            "data_loader.dataset_modules.module_dict.LoadConceptualCaptions"
            f".config.train={tmp_path}/cc.parquet",
            "data_loader.dataset_modules.module_dict.LoadConceptualCaptions"
            f".config.val={tmp_path}/cc.parquet",
        ])
        import os as _os

        exp = f"{tmp_path}/experiments/cli_smoke"
        assert _os.path.exists(f"{exp}/config.json")
        assert _os.path.exists(f"{exp}/train/saved_model/model_00")

    def test_mapper_training_reduces_loss(self, tmp_path):
        config = self.make_cc_config(tmp_path)
        executor = build_executor(config)
        # capture initial loss, train, compare
        first_batch = next(iter(executor.train_dataloader))
        import jax.numpy as jnp

        from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (
            vct0_caption_loss,
        )

        loss_before = float(vct0_caption_loss(
            executor.model.params["mapper"], executor.model.params["lm"],
            executor.model.cfg,
            jnp.asarray(first_batch.clip_embeddings),
            jnp.asarray(first_batch.labels),
        ))
        executor.train()
        loss_after = float(vct0_caption_loss(
            executor.model.params["mapper"], executor.model.params["lm"],
            executor.model.cfg,
            jnp.asarray(first_batch.clip_embeddings),
            jnp.asarray(first_batch.labels),
        ))
        assert np.isfinite(loss_after)
        assert loss_after < loss_before
        # checkpoints were written with last/best aliases
        from explicit_alignment_for_vqa_tasks_tpu.trainers.checkpointing import (  # noqa: E501
            get_checkpoint_model_path,
        )
        assert get_checkpoint_model_path(config.saved_model_path) is not None


class TestEvalPipelining:
    def test_pipelined_loop_matches_serial(self, tmp_path):
        """The 1-deep dispatch/collect pipeline (BaseExecutor._eval_loop)
        must produce exactly the outputs of the serial per-batch loop."""
        fixtures = write_vqa_fixtures(tmp_path)
        config = make_test_config(tmp_path, fixtures)
        executor = build_executor(config)

        serial = [
            executor._generative_step(batch, i)
            for i, batch in enumerate(executor.test_dataloader)
        ]
        pipelined = executor._eval_loop()
        assert len(pipelined) == len(serial) >= 2
        for a, b in zip(serial, pipelined):
            assert a["predictions"] == b["predictions"]
            assert a["question_ids"] == b["question_ids"]
