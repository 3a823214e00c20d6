"""Offline tools: CLIP encoders, extraction pipelines, analysis scripts."""

import json
import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.clip import (  # noqa: E402
    CLIPVisionConfig,
    init_clip_vision_params,
)
from explicit_alignment_for_vqa_tasks_tpu.tools.clip_encoder import (  # noqa: E402
    ClipImageEncoder,
    preprocess_image,
)


@pytest.fixture(scope="module")
def tiny_encoder():
    cfg = CLIPVisionConfig.small_test()
    params = init_clip_vision_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return ClipImageEncoder(cfg=cfg, params=params, batch_size=4)


class TestPreprocess:
    def test_resize_center_crop_normalize(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(60, 90, 3)).astype(np.uint8)
        out = preprocess_image(img, 28)
        assert out.shape == (28, 28, 3)
        assert out.dtype == np.float32
        assert -3.0 < out.mean() < 3.0

    def test_grayscale_and_rgba(self):
        gray = np.zeros((40, 40), dtype=np.uint8)
        assert preprocess_image(gray, 28).shape == (28, 28, 3)
        rgba = np.zeros((40, 40, 4), dtype=np.uint8)
        assert preprocess_image(rgba, 28).shape == (28, 28, 3)


class TestClipImageEncoder:
    def test_encode_batch_pads_partial(self, tiny_encoder):
        rng = np.random.default_rng(1)
        images = rng.standard_normal((3, 28, 28, 3)).astype(np.float32)
        out = tiny_encoder.encode_batch(images)
        assert out.shape == (3, 16)

    def test_encode_iter_streams(self, tiny_encoder):
        rng = np.random.default_rng(2)
        items = [
            (f"img{i}", rng.standard_normal((28, 28, 3)).astype(np.float32))
            for i in range(9)
        ]
        out = dict(tiny_encoder.encode_iter(items))
        assert set(out) == {f"img{i}" for i in range(9)}
        # deterministic: same image -> same embedding regardless of batch
        single = tiny_encoder.encode_batch(items[0][1][None])[0]
        np.testing.assert_allclose(out["img0"], single, rtol=1e-5, atol=1e-5)


class TestImageExtraction:
    def test_extract_writes_reference_format(self, tmp_path, tiny_encoder):
        from PIL import Image

        from explicit_alignment_for_vqa_tasks_tpu.tools import (
            extract_contrastive_image_embeddings as mod,
        )

        img_dir = tmp_path / "val2014"
        img_dir.mkdir()
        rng = np.random.default_rng(3)
        for img_id in (7, 8):
            arr = rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8)
            Image.fromarray(arr).save(
                img_dir / f"COCO_val2014_{str(img_id).zfill(12)}.jpg"
            )
        q_file = tmp_path / "questions.json"
        q_file.write_text(json.dumps({"questions": [
            {"question_id": 1, "image_id": 7, "question": "q?"},
            {"question_id": 2, "image_id": 8, "question": "q?"},
            {"question_id": 3, "image_id": 8, "question": "q2?"},
        ]}))
        out = tmp_path / "emb.pkl"
        embeddings = mod.extract(
            str(q_file), str(img_dir), "val2014", str(out),
            encoder=tiny_encoder,
        )
        assert set(embeddings) == {"7", "8"}  # unique images only
        assert embeddings["7"].shape == (1, 16)
        with open(out, "rb") as fh:
            assert set(pickle.load(fh)) == {"7", "8"}


class TestCCExtraction:
    def test_extract_rows_with_fake_fetch(self, tmp_path, tiny_encoder):
        import pyarrow.parquet as pq

        from explicit_alignment_for_vqa_tasks_tpu.tools import (
            extract_clip_embeddings_conceptual_captions as mod,
        )

        rng = np.random.default_rng(4)

        def fake_fetch(url):
            if url.endswith("bad"):
                return None  # simulates a dead link
            return rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8)

        rows = [
            {"image_url": f"http://x/{i}", "caption": f"a cat {i}."}
            for i in range(5)
        ] + [{"image_url": "http://x/bad", "caption": "gone"}]
        out = tmp_path / "cc.parquet"
        n = mod.extract_rows(rows, str(out), encoder=tiny_encoder,
                             batch_size=4, num_threads=2, fetch=fake_fetch)
        assert n == 5
        table = pq.read_table(out)
        assert table.column_names == [
            "image_url", "caption", "clip_embeddings"
        ]
        # caption normalization: trailing ' .'
        assert table.column("caption").to_pylist()[0][0].endswith(" .")

    def test_normalize_caption(self):
        from explicit_alignment_for_vqa_tasks_tpu.tools.\
            extract_clip_embeddings_conceptual_captions import (
            normalize_caption,
        )

        assert normalize_caption("a dog.") == "a dog ."
        assert normalize_caption("a dog") == "a dog ."
        assert normalize_caption("  a dog . ") == "a dog ."


class TestGenerateCaptions:
    pytestmark = pytest.mark.heavy  # see Makefile tiers
    def test_generate_captions_with_forced_prefix(self):
        from explicit_alignment_for_vqa_tasks_tpu.data.tokenization import (
            SimpleTokenizer,
        )
        from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (
            MapperConfig,
        )
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import T5Config
        from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (
            VCT0Config,
            VCT0Model,
            init_vct0_params,
        )
        from explicit_alignment_for_vqa_tasks_tpu.tools.generate_captions import (
            generate_captions,
        )

        lm = T5Config.small_test()
        cfg = VCT0Config(
            lm=lm,
            mapper=MapperConfig(mapping_type="mlp", prefix_size=8,
                                d_model=lm.d_model, prefix_length=2,
                                clip_length=2),
        )
        params = init_vct0_params(jax.random.PRNGKey(0), cfg,
                                  param_dtype=jnp.float32)
        model = VCT0Model(cfg, params)
        tokenizer = SimpleTokenizer()
        rng = np.random.default_rng(0)
        embeddings = rng.standard_normal((3, 8)).astype(np.float32)
        captions = generate_captions(
            model, tokenizer, embeddings, max_new_tokens=4, batch_size=2
        )
        assert len(captions) == 3
        assert all(c.startswith("A picture of") for c in captions)

        plain = generate_captions(
            model, tokenizer, embeddings, forced_prefix=None,
            max_new_tokens=4, batch_size=2,
        )
        assert len(plain) == 3


class TestAnalysis:
    def test_answer_length_analysis(self, tmp_path):
        from explicit_alignment_for_vqa_tasks_tpu.tools.\
            answer_length_analysis import analyse

        preds = tmp_path / "answers.pkl"
        preds.write_bytes(pickle.dumps([
            {"question_id": 1, "answer": "red"},
            {"question_id": 2, "answer": "two dogs"},
        ]))
        examples = tmp_path / "rices.pkl"
        examples.write_bytes(pickle.dumps({
            "1": [{"gold_answer": "red"}], "2": [{"gold_answer": "blue"}],
        }))
        result = analyse(str(preds), str(examples), num_shots=1)
        assert result["num_predictions"] == 2
        assert result["copy_from_shot_rate"] == 0.5

    def test_report_plot(self, tmp_path):
        from explicit_alignment_for_vqa_tasks_tpu.tools.report_plots import (
            plot_curves,
        )

        out = plot_curves(
            {"ours": {0: 30.0, 4: 35.0}}, str(tmp_path / "plot.png")
        )
        import os

        assert os.path.exists(out)


class TestInt8DriftStudy:
    pytestmark = pytest.mark.heavy  # see Makefile tiers
    def test_tiny_smoke_runs_all_variants(self, capsys, monkeypatch):
        """--tiny exercises the drift-study machinery (calibration, the
        four quantization variants incl. full_stack with int8 cross-KV
        decode, outlier injection) on CPU; real numbers come from the
        chip run recorded in PARITY.md."""
        import sys as _sys

        from explicit_alignment_for_vqa_tasks_tpu.tools import (
            int8_drift_study,
        )

        monkeypatch.setattr(
            _sys, "argv",
            ["int8_drift_study", "--tiny", "--mode", "outlier"],
        )
        int8_drift_study.main()
        line = capsys.readouterr().out.strip().splitlines()[-1]
        out = json.loads(line)
        assert out["shapes"]["tiny"] is True
        variants = out["outlier"]
        assert set(variants) == {
            "per_channel", "grouped", "grouped_smooth", "full_stack",
        }
        for v in variants.values():
            assert 0.0 <= v["full_sequence_match_rate"] <= 1.0
            assert v["last_layer_rel_error"] > 0.0

    def test_weights_mode_runs_on_hf_checkpoint(self, capsys, monkeypatch,
                                                tmp_path):
        """--weights <hf_dir> (VERDICT r4 #6): the drift study loads a
        LOCAL HF T5 checkpoint and reports a trained-weights drift row
        (random-init margins are uninterpretable). CI proves the path on
        a tiny checkpoint; on real hardware the same flag points at the
        mounted T0-3B dir."""
        import sys as _sys

        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")

        hf_cfg = transformers.T5Config(
            vocab_size=256, d_model=32, d_kv=8, num_heads=4, d_ff=64,
            num_layers=2, num_decoder_layers=2,
            feed_forward_proj="gated-gelu", tie_word_embeddings=False,
            dropout_rate=0.0, relative_attention_num_buckets=8,
            relative_attention_max_distance=16,
            decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
        )
        torch.manual_seed(3)
        transformers.T5ForConditionalGeneration(hf_cfg).save_pretrained(
            tmp_path / "tiny_t0"
        )

        from explicit_alignment_for_vqa_tasks_tpu.tools import (
            int8_drift_study,
        )

        monkeypatch.setattr(
            _sys, "argv",
            ["int8_drift_study", "--weights", str(tmp_path / "tiny_t0")],
        )
        int8_drift_study.main()
        line = capsys.readouterr().out.strip().splitlines()[-1]
        out = json.loads(line)
        assert out["metric"] == \
            "int8_encoder_drift_vs_bf16_trained_weights"
        assert "trained" in out and "normal" not in out
        variants = out["trained"]
        assert set(variants) == {
            "per_channel", "grouped", "grouped_smooth", "full_stack",
        }


class TestMeshEncoders:
    """--mesh_data sharded extraction == single-device (VERDICT r4 #7)."""

    def test_image_encoder_mesh_equals_single(self, tiny_encoder):
        from explicit_alignment_for_vqa_tasks_tpu.parallel.mesh import (
            make_data_mesh,
        )
        from explicit_alignment_for_vqa_tasks_tpu.tools.clip_encoder import (
            ClipImageEncoder,
        )

        meshed = ClipImageEncoder(
            cfg=tiny_encoder.cfg, params=tiny_encoder.params, batch_size=4,
            mesh=make_data_mesh(4),
        )
        rng = np.random.default_rng(9)
        images = rng.standard_normal((7, 28, 28, 3)).astype(np.float32)
        out_s = tiny_encoder.encode_batch(images[:4])
        out_m = meshed.encode_batch(images[:4])
        np.testing.assert_allclose(out_m, out_s, rtol=1e-6, atol=1e-6)
        # partial batch (pads to 4, shards, trims)
        np.testing.assert_allclose(
            meshed.encode_batch(images[4:]),
            tiny_encoder.encode_batch(images[4:]), rtol=1e-6, atol=1e-6,
        )

    def test_mesh_requires_divisible_batch(self):
        import pytest as _pytest

        from explicit_alignment_for_vqa_tasks_tpu.parallel.mesh import (
            make_data_mesh,
        )
        from explicit_alignment_for_vqa_tasks_tpu.tools.clip_encoder import (
            _check_encoder_mesh,
        )

        with _pytest.raises(ValueError, match="must divide"):
            _check_encoder_mesh(make_data_mesh(4), batch_size=6)
        # size-1 request -> no mesh
        assert _check_encoder_mesh(None, 4) is None
        assert make_data_mesh(1) is None
        assert make_data_mesh(0) is None


class TestTrainStepStudy:
    """tools/train_step_study.py — the mapper train-step MFU accounting
    (VERDICT r4 #2). Real numbers come from the chip run in PARITY.md;
    here we pin the analytic FLOP model and the --tiny machinery."""

    def test_flop_model_scales_linearly_in_layers_and_tokens(self):
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import T5Config
        from explicit_alignment_for_vqa_tasks_tpu.tools.train_step_study import (
            t5_train_flops_per_example,
        )

        cfg = T5Config.small_test()
        base = t5_train_flops_per_example(cfg, enc_len=8, dec_len=16)
        # fwd + 1x-dx backward, dW excluded -> with_dw adds exactly fwd/2
        with_dw = t5_train_flops_per_example(cfg, 8, 16, with_dw=True)
        assert with_dw == pytest.approx(base * 1.5)
        # param-matmul terms are linear in token counts; attention terms
        # quadratic — doubling dec_len must grow FLOPs by more than 2x
        # of the dec-linear share but stay below fully-quadratic growth
        double_dec = t5_train_flops_per_example(cfg, 8, 32)
        assert base < double_dec < 4 * base
        # 10-token prefix encoder at T0-3B shape: the decoder dominates
        big = T5Config()  # t0_3b defaults
        f = t5_train_flops_per_example(big, enc_len=10, dec_len=32)
        # ~3B params, 42 tokens, fwd+bwd(dx) = 2x fwd -> order 1e12
        assert 1e11 < f < 1e13

    @pytest.mark.heavy
    def test_tiny_smoke_emits_all_sections(self, capsys, monkeypatch):
        import sys as _sys

        from explicit_alignment_for_vqa_tasks_tpu.tools import (
            train_step_study,
        )

        monkeypatch.setattr(
            _sys, "argv",
            ["train_step_study", "--tiny", "--cpu", "--batches", "4",
             "--steps", "2", "--trials", "1",
             "--variants", "base,fwd"],
        )
        train_step_study.main()
        line = capsys.readouterr().out.strip().splitlines()[-1]
        out = json.loads(line)
        assert out["config"]["tiny"] is True
        assert "4" in out["batch_sweep"]
        assert out["batch_sweep"]["4"]["ms_per_step"] > 0
        fwd = out["variants"]["fwd"]
        # forward-only must be faster than the full step, and the bound
        # arithmetic must have fired off the measured pair
        assert fwd["ms_per_step"] < out["variants"]["base"]["ms_per_step"]
        assert out["int8_forward_bound"]["max_step_speedup"] > 1.0
