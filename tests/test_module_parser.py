import numpy as np
import pytest

from explicit_alignment_for_vqa_tasks_tpu.data.module_parser import (
    pad_to_length,
    pick_bucket,
)
from explicit_alignment_for_vqa_tasks_tpu.data.tokenization import (
    T5_SENTINEL_BASE,
    SimpleTokenizer,
)
from explicit_alignment_for_vqa_tasks_tpu.data.vqa2_datasets import VQA2Dataset
from explicit_alignment_for_vqa_tasks_tpu.utils.attr_dict import AttrDict


def make_config(**additional):
    base_additional = dict(
        max_source_length=64,
        max_decoder_source_length=64,
        max_target_length=10,
        num_shots=2,
        pass_examples_through_encoder_one_at_a_time=0,
        num_permutations_of_in_context_examples=0,
        sample_templates=0,
        ensemble_one_shots=0,
    )
    base_additional.update(additional)
    return AttrDict(
        tpu={"length_buckets": [16, 32, 64]},
        data_loader={"additional": base_additional},
        model_config={
            "input_modules": {
                "module_list": [
                    {"type": "QInput", "option": "hotpotqa",
                     "separation_tokens": {"start": "", "end": ""}},
                    {"type": "EmbeddingInput", "option": "default"},
                ],
                "postprocess_module_list": [
                    {"type": "PostProcessClipEmbeddings", "option": "default"},
                    {"type": "PostProcessInputTokenization",
                     "option": "generation"},
                ],
            },
            "decoder_input_modules": {
                "module_list": [], "postprocess_module_list": [],
            },
            "output_modules": {
                "module_list": [
                    {"type": "GenerationOutput", "option": "default"},
                ],
                "postprocess_module_list": [
                    {"type": "PostProcessOutputTokenization",
                     "option": "default"},
                ],
            },
        },
    )


def make_dataset(config):
    rng = np.random.default_rng(0)
    embeddings = {
        str(key): rng.standard_normal((1, 8), dtype=np.float32)
        for key in [100, 101, 102, 200]
    }
    data_items = [
        AttrDict(
            question_id=7, question="Where is he looking?",
            img_key=200, img_key_full="000000000200", img=[],
            gold_answer="down",
            answers=["down"] * 10,
        )
    ]
    in_context = {
        "7": [
            # ascending similarity: best example LAST
            {"question_id": 3, "img_key": 102,
             "question": "Worst question?", "gold_answer": "maybe"},
            {"question_id": 1, "img_key": 100,
             "question": "What color is the boys hat?", "gold_answer": "red"},
            {"question_id": 2, "img_key": 101,
             "question": "Is the man wearing a shirt?", "gold_answer": "no"},
        ]
    }
    tok = SimpleTokenizer()
    return VQA2Dataset(config, dict(
        mode="test",
        data=AttrDict(data_items=data_items),
        clip_embeddings=embeddings,
        in_context_examples=in_context,
        answer_candidate_list=["down"],
        tokenizer=tok,
        decoder_tokenizer=tok,
        feature_extractor=None,
        image_preprocessor=None,
    )), embeddings


class TestBucketing:
    def test_pick_bucket(self):
        assert pick_bucket(10, [16, 32], 64) == 16
        assert pick_bucket(17, [16, 32], 64) == 32
        assert pick_bucket(40, [16, 32], 64) == 64
        assert pick_bucket(100, [16, 32], 64) == 64
        assert pick_bucket(10, None, 64) == 64

    def test_pad_to_length_sides(self):
        arr = np.array([[1, 2]])
        np.testing.assert_array_equal(
            pad_to_length(arr, 4, 0), [[1, 2, 0, 0]]
        )
        np.testing.assert_array_equal(
            pad_to_length(arr, 4, 0, side="left"), [[0, 0, 1, 2]]
        )


class TestVQA2DatasetPipeline:
    def test_getitem_takes_last_k_shots(self):
        config = make_config(num_shots=2)
        dataset, embeddings = make_dataset(config)
        sample = dataset[0]
        # best examples are at the END of the stored list
        assert [e["question_id"] for e in sample.in_context_examples] == [1, 2]
        assert len(sample.clip_embedding) == 3  # 2 shots + test image
        np.testing.assert_array_equal(
            np.asarray(sample.clip_embedding[-1]), embeddings["200"]
        )

    def test_zero_shots(self):
        config = make_config(num_shots=0)
        dataset, _ = make_dataset(config)
        sample = dataset[0]
        assert sample.in_context_examples == []
        assert len(sample.clip_embedding) == 1

    def test_collate_produces_static_bucketed_batch(self):
        config = make_config(num_shots=2)
        dataset, _ = make_dataset(config)
        batch = dataset.collate_fn([dataset[0]])
        # tokenized prompt namespaced generative_* ('generation' option)
        assert batch.generative_input_ids.shape[-1] in (16, 32, 64)
        assert batch.generative_input_ids.shape[0] == 1
        # sentinel ids present for each of the 3 images
        ids = set(batch.generative_input_ids[0].tolist())
        for i in range(3):
            assert T5_SENTINEL_BASE - i in ids
        # embeddings stacked (B, k+1, d)
        assert batch.clip_embeddings.shape == (1, 3, 8)
        # labels: fixed max_target_length with first pad kept
        assert batch.labels.shape[-1] == 10
        row = batch.labels[0].tolist()
        assert row[0] != -100
        assert -100 in row
        # meta fields
        assert batch.question_ids == [7]
        assert batch.gold_answers == ["down"]

    def test_labels_first_pad_kept(self):
        config = make_config(num_shots=0)
        dataset, _ = make_dataset(config)
        batch = dataset.collate_fn([dataset[0]])
        tok = dataset.tokenizer
        row = batch.labels[0].tolist()
        # sequence is [word, eos, pad(kept), -100, ...]
        first_pad_idx = row.index(tok.pad_token_id)
        assert all(v == -100 for v in row[first_pad_idx + 1:])

    def test_permutation_mode_shapes(self):
        config = make_config(
            num_shots=2, num_permutations_of_in_context_examples=3
        )
        dataset, _ = make_dataset(config)
        batch = dataset.collate_fn([dataset[0]])
        # flattened: 1 sample x 3 permutations
        assert batch.generative_input_ids.shape[0] == 3
        assert batch.clip_embeddings.shape == (1, 3, 3, 8)

    def test_one_at_a_time_mode_flattens_segments(self):
        config = make_config(
            num_shots=2, pass_examples_through_encoder_one_at_a_time=1
        )
        dataset, _ = make_dataset(config)
        batch = dataset.collate_fn([dataset[0]])
        # 3 segments (2 shots + test) each tokenized separately
        assert batch.generative_input_ids.shape[0] == 3


class TestSimpleTokenizer:
    def test_sentinel_ids(self):
        tok = SimpleTokenizer()
        ids = tok.tokenize_to_ids("<extra_id_0> hello <extra_id_5>")
        assert ids[0] == T5_SENTINEL_BASE
        assert ids[2] == T5_SENTINEL_BASE - 5

    def test_roundtrip_decode(self):
        tok = SimpleTokenizer()
        enc = tok(["hello world"], return_tensors="np")
        assert tok.decode(enc.input_ids[0]) == "hello world"

    def test_left_padding(self):
        tok = SimpleTokenizer()
        tok.padding_side = "left"
        enc = tok(["a", "b c d"], return_tensors="np")
        assert enc.input_ids.shape == (2, 4)
        assert enc.input_ids[0][0] == tok.pad_token_id
        assert enc.attention_mask[0].tolist() == [0, 0, 1, 1]
