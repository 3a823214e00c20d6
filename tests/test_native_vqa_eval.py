"""C++ native VQA eval vs the Python implementation — exact parity."""

import numpy as np
import pytest

from explicit_alignment_for_vqa_tasks_tpu.native import (
    native_available,
    normalize_answer_native,
    vqa_accuracies_native,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.vqa_eval import (
    normalize_answer,
    process_digit_article,
    process_punctuation,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no g++)"
)

TRICKY = [
    "yes", "Yes", "two dogs", "the cat on a mat", "dont", "yall",
    "red ; blue", "red;blue", "1,000-piece", "a.m.", "1.5", "none",
    " The two \n cats! ", "it's 10 o'clock", "somebody'd", "",
    "what?!", "a/b\\c", "x@y#z", "twenty-two", "3.14 is pi.",
    "he  has   many    spaces", "question: answer", "[bracketed]",
    "trailing space ", "\ttabbed\t", "ten ten ten", "an apple a day",
    "1. 2. 3. 4.", "......", "9,999 and 8,888",
]


class TestNativeParity:
    @pytest.mark.parametrize("text", TRICKY)
    def test_normalize_matches_python(self, text):
        want = normalize_answer(text)
        got = normalize_answer_native(text)
        assert got == want, f"{text!r}: native {got!r} != python {want!r}"

    def test_randomized_normalization(self):
        rng = np.random.default_rng(0)
        alphabet = list("abcdefgh .,;?!-/'\"()[]0123456789\n\t")
        for _ in range(300):
            n = int(rng.integers(0, 30))
            text = "".join(rng.choice(alphabet, size=n))
            want = process_digit_article(process_punctuation(
                text.replace("\n", " ").replace("\t", " ").strip()
            ))
            got = normalize_answer_native(text)
            assert got == want, f"{text!r}: {got!r} != {want!r}"

    def test_batch_accuracies_match_python_protocol(self):
        cases = [
            (["yes"] * 10, "yes", 1.0),
            (["yes"] * 10, "Yes", 0.0),       # unanimous: no normalization
            (["cat"] * 3 + ["dog"] * 7, "cat", 0.9),
            (["two"] * 5 + ["2"] * 5, "2", 1.0),  # normalization applies
            (["a"] * 10, "b", 0.0),
        ]
        gt = [c[0] for c in cases]
        preds = [c[1] for c in cases]
        got = vqa_accuracies_native(gt, preds)
        want = np.asarray([c[2] for c in cases])
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_end_to_end_vqa_eval_native_matches_python(self, tmp_path):
        from tests.test_vqa_eval import make_vqa

        from explicit_alignment_for_vqa_tasks_tpu.utils.vqa_eval import VQAEval

        vqa = make_vqa(tmp_path, [
            (1, 10, "is it?", ["yes"] * 10, "is it", "yes/no"),
            (2, 11, "what animal?", ["cat"] * 3 + ["dog"] * 7, "what",
             "other"),
            (3, 12, "how many?", ["two"] * 5 + ["2"] * 5, "how many",
             "number"),
        ])
        preds = [
            {"question_id": 1, "answer": "yes"},
            {"question_id": 2, "answer": "cat"},
            {"question_id": 3, "answer": "2"},
        ]
        res = vqa.load_res_from_list(preds)
        ev_native = VQAEval(vqa, res, use_native=True)
        ev_native.evaluate()
        ev_python = VQAEval(vqa, res, use_native=False)
        ev_python.evaluate()
        assert ev_native.accuracy == ev_python.accuracy
        assert ev_native.evalQA == ev_python.evalQA
