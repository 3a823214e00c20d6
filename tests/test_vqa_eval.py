import json

import pytest

from explicit_alignment_for_vqa_tasks_tpu.utils.vqa_eval import (
    VQAEval,
    normalize_answer,
    process_digit_article,
    process_punctuation,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.vqa_tools import VQA


def make_vqa(tmp_path, questions_answers):
    """questions_answers: list of (qid, image_id, question, [10 answers], qtype, atype)."""
    annotations = {
        "info": {"description": "fixture"},
        "task_type": "Open-Ended",
        "data_type": "mscoco",
        "data_subtype": "val2014",
        "license": {},
        "annotations": [
            {
                "question_id": qid,
                "image_id": img,
                "question_type": qtype,
                "answer_type": atype,
                "multiple_choice_answer": answers[0],
                "answers": [
                    {"answer": a, "answer_confidence": "yes", "answer_id": i + 1}
                    for i, a in enumerate(answers)
                ],
            }
            for qid, img, _, answers, qtype, atype in questions_answers
        ],
    }
    questions = {
        "info": {"description": "fixture"},
        "task_type": "Open-Ended",
        "data_type": "mscoco",
        "data_subtype": "val2014",
        "license": {},
        "questions": [
            {"question_id": qid, "image_id": img, "question": q}
            for qid, img, q, _, _, _ in questions_answers
        ],
    }
    ann_path = tmp_path / "annotations.json"
    q_path = tmp_path / "questions.json"
    ann_path.write_text(json.dumps(annotations))
    q_path.write_text(json.dumps(questions))
    return VQA(str(ann_path), str(q_path))


class TestNormalization:
    def test_number_words(self):
        assert process_digit_article("two dogs") == "2 dogs"
        assert process_digit_article("none") == "0"

    def test_articles_removed(self):
        assert process_digit_article("the cat on a mat") == "cat on mat"

    def test_contractions(self):
        assert process_digit_article("dont") == "don't"
        assert process_digit_article("yall") == "y'all"

    def test_punctuation_spacing_rule(self):
        # punct adjacent to space in the original is deleted; embedded
        # punct becomes a space
        assert process_punctuation("red ; blue") == "red  blue"
        assert process_punctuation("red;blue") == "red blue"

    def test_numeric_comma(self):
        # a digit,digit pattern forces deletion of all punctuation
        assert process_punctuation("1,000-piece") == "1000piece"

    def test_period_strip(self):
        assert process_punctuation("a.m.") == "am"
        assert process_punctuation("1.5") == "1.5"  # decimal point kept

    def test_full_pipeline(self):
        assert normalize_answer(" The two \n cats! ") == "2 cats"


class TestVQAEvalProtocol:
    def test_unanimous_exact(self, tmp_path):
        vqa = make_vqa(tmp_path, [
            (1, 10, "is it?", ["yes"] * 10, "is it", "yes/no"),
        ])
        res = vqa.load_res_from_list([{"question_id": 1, "answer": "yes"}])
        ev = VQAEval(vqa, res, n=2)
        ev.evaluate()
        assert ev.accuracy["overall"] == 100.0

    def test_unanimous_skips_normalization(self, tmp_path):
        # all annotators identical -> NO normalization -> case mismatch fails
        vqa = make_vqa(tmp_path, [
            (1, 10, "is it?", ["yes"] * 10, "is it", "yes/no"),
        ])
        res = vqa.load_res_from_list([{"question_id": 1, "answer": "Yes"}])
        ev = VQAEval(vqa, res)
        ev.evaluate()
        assert ev.accuracy["overall"] == 0.0

    def test_min_matches_over_three(self, tmp_path):
        # 3 "cat" + 7 "dog", prediction "cat":
        # cat-annotators see 2 other cats -> 2/3; dog-annotators see 3 -> 1.0
        # avg = (3*(2/3) + 7*1)/10 = 0.9
        vqa = make_vqa(tmp_path, [
            (1, 10, "what animal?", ["cat"] * 3 + ["dog"] * 7,
             "what", "other"),
        ])
        res = vqa.load_res_from_list([{"question_id": 1, "answer": "cat"}])
        ev = VQAEval(vqa, res)
        ev.evaluate()
        assert ev.accuracy["overall"] == 90.0
        assert ev.evalQA[1] == 90.0

    def test_normalization_applied_on_disagreement(self, tmp_path):
        vqa = make_vqa(tmp_path, [
            (1, 10, "how many?", ["two"] * 5 + ["2"] * 5, "how many", "number"),
        ])
        res = vqa.load_res_from_list([{"question_id": 1, "answer": "2"}])
        ev = VQAEval(vqa, res)
        ev.evaluate()
        assert ev.accuracy["overall"] == 100.0

    def test_per_type_breakdowns(self, tmp_path):
        vqa = make_vqa(tmp_path, [
            (1, 10, "is it?", ["yes"] * 10, "is it", "yes/no"),
            (2, 11, "what color?", ["red"] * 10, "what color", "other"),
        ])
        res = vqa.load_res_from_list([
            {"question_id": 1, "answer": "yes"},
            {"question_id": 2, "answer": "blue"},
        ])
        ev = VQAEval(vqa, res)
        ev.evaluate()
        assert ev.accuracy["overall"] == 50.0
        assert ev.accuracy["perQuestionType"]["is it"] == 100.0
        assert ev.accuracy["perQuestionType"]["what color"] == 0.0
        assert ev.accuracy["perAnswerType"]["yes/no"] == 100.0
        assert ev.accuracy["perAnswerType"]["other"] == 0.0

    def test_coverage_assertion(self, tmp_path):
        vqa = make_vqa(tmp_path, [
            (1, 10, "is it?", ["yes"] * 10, "is it", "yes/no"),
            (2, 11, "what?", ["red"] * 10, "what", "other"),
        ])
        with pytest.raises(AssertionError):
            vqa.load_res_from_list([{"question_id": 1, "answer": "yes"}])

    def test_filters(self, tmp_path):
        vqa = make_vqa(tmp_path, [
            (1, 10, "is it?", ["yes"] * 10, "is it", "yes/no"),
            (2, 10, "what?", ["red"] * 10, "what", "other"),
            (3, 11, "what?", ["blue"] * 10, "what", "other"),
        ])
        assert sorted(vqa.get_ques_ids(img_ids=[10])) == [1, 2]
        assert vqa.get_ques_ids(ans_types=["other"]) == [2, 3]
        assert sorted(set(vqa.get_img_ids(ques_types=["what"]))) == [10, 11]
