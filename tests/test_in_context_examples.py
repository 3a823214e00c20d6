import pytest

from explicit_alignment_for_vqa_tasks_tpu.data.in_context_examples import (
    FORMATS,
    InContextExampleFormatter,
)

EXAMPLES = [
    {
        "question_id": 508840006,
        "img_key": 508840,
        "question": "What color is the boys hat?",
        "gold_answer": "red",
    },
    {
        "question_id": 135938002,
        "img_key": 135938,
        "question": "Is the man wearing a shirt?",
        "gold_answer": "no",
    },
]

TEST_SAMPLE = {
    "question_id": 262148000,
    "question": "Where is he looking?",
    "gold_answer": "down",
}


class TestGoldenPrompts:
    """Golden strings for the prompt layer (behavior-critical for parity)."""

    @pytest.mark.parametrize("format_type, expected", [
        (
            "default",
            "<extra_id_0>\nWhat color is the boys hat?\nred\n"
            "<extra_id_1>\nIs the man wearing a shirt?\nno\n"
            "<extra_id_2>\nWhere is he looking?\n",
        ),
        (
            "hotpotqa",
            "<extra_id_0>\nCombine facts and answer this:\n"
            "What color is the boys hat?\nred\n"
            "<extra_id_1>\nCombine facts and answer this:\n"
            "Is the man wearing a shirt?\nno\n"
            "<extra_id_2>\nCombine facts and answer this:\n"
            "Where is he looking?\n",
        ),
        (
            "frozen",
            "<extra_id_0>\nQuestion: What color is the boys hat?\nAnswer: red\n"
            "<extra_id_1>\nQuestion: Is the man wearing a shirt?\nAnswer: no\n"
            "<extra_id_2>\nQuestion: Where is he looking?\nAnswer: ",
        ),
        (
            # text-only path: the implementation appends "." to in-context
            # answers (reference impl behavior; its own golden test is stale)
            "hotpotqa_no_prefix",
            "Combine facts and answer this:\nWhat color is the boys hat?\nred.\n"
            "Combine facts and answer this:\nIs the man wearing a shirt?\nno.\n"
            "Combine facts and answer this:\nWhere is he looking?\n",
        ),
    ])
    def test_two_shot(self, format_type, expected):
        formatter = InContextExampleFormatter(format_type=format_type)
        assert formatter.format_input(EXAMPLES, TEST_SAMPLE) == expected

    @pytest.mark.parametrize("format_type, expected", [
        ("default", "<extra_id_0>\nWhere is he looking?\n"),
        ("hotpotqa",
         "<extra_id_0>\nCombine facts and answer this:\nWhere is he looking?\n"),
        ("hotpotqa_no_prefix",
         "Combine facts and answer this:\nWhere is he looking?\n"),
    ])
    def test_zero_shot(self, format_type, expected):
        formatter = InContextExampleFormatter(format_type=format_type)
        assert formatter.format_input([], TEST_SAMPLE) == expected


class TestModes:
    def test_one_at_a_time_returns_segments(self):
        formatter = InContextExampleFormatter(
            "hotpotqa", pass_examples_through_encoder_one_at_a_time=True
        )
        segments = formatter.format_input(EXAMPLES, TEST_SAMPLE)
        assert isinstance(segments, list) and len(segments) == 3
        assert segments[0].startswith("<extra_id_0>")
        assert segments[2].startswith("<extra_id_2>")

    def test_ensemble_one_shots(self):
        formatter = InContextExampleFormatter(
            "hotpotqa", ensemble_one_shots=True
        )
        prompts = formatter.format_input(EXAMPLES, TEST_SAMPLE)
        assert len(prompts) == 2
        # each single-shot prompt renumbers sentinels from 0
        for prompt in prompts:
            assert "<extra_id_0>" in prompt and "<extra_id_1>" in prompt
            assert "<extra_id_2>" not in prompt

    def test_sample_templates_uses_list(self):
        import random

        random.seed(2022)
        formatter = InContextExampleFormatter("hotpotqa", sample_templates=True)
        prompt = formatter.format_input(EXAMPLES, TEST_SAMPLE)
        assert any(
            template.split("\n")[1] in prompt
            for template in FORMATS["hotpotqa_list"]
        )

    def test_extractive_has_no_answer_slot(self):
        formatter = InContextExampleFormatter("extractive")
        prompt = formatter.format_input([], TEST_SAMPLE)
        assert prompt == (
            "Extract the answer to the question from the following context.\n"
            "Question: Where is he looking?\nContext: <extra_id_0>"
        )
