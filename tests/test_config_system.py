import argparse
import os

import pytest

from explicit_alignment_for_vqa_tasks_tpu.utils import (
    AttrDict,
    evaluate_snippet,
    merge_patch,
    process_config,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.jsonnet_eval import evaluate_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_args(config, mode="test", **kw):
    ns = argparse.Namespace(
        config=config,
        mode=mode,
        experiment_name="",
        reset=False,
        num_shots=-1,
        no_prefix=0,
        pass_examples_through_encoder_one_at_a_time=0,
        num_permutations_of_in_context_examples=0,
        sample_templates=0,
        ensemble_one_shots=0,
        in_context_examples_fpath="",
        modules=[],
        tags=[],
        test_batch_size=-1,
        test_evaluation_name="",
        opts=[],
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


class TestJsonnetSubset:
    def test_literals_and_locals(self):
        src = """
        // comment
        local a = 5;  # other comment
        local b = {"x": a, y: true, "z": null, "w": 1e-08};
        /* block */
        {"out": b, "s": 'hi', "lst": [1, 2, 3]}
        """
        result = evaluate_snippet(src)
        assert result == {
            "out": {"x": 5, "y": True, "z": None, "w": 1e-08},
            "s": "hi",
            "lst": [1, 2, 3],
        }

    def test_merge_patch(self):
        base = {"a": {"b": 1, "c": 2}, "keep": [1]}
        patch = {"a": {"b": 9, "d": 3}, "new": "x"}
        assert merge_patch(base, patch) == {
            "a": {"b": 9, "c": 2, "d": 3},
            "keep": [1],
            "new": "x",
        }
        # null removes keys (jsonnet std.mergePatch semantics)
        assert merge_patch({"a": 1, "b": 2}, {"a": None}) == {"b": 2}

    def test_std_merge_patch_in_snippet(self):
        src = """
        local base = {"a": 1, "nested": {"x": 1}};
        std.mergePatch(base, {"nested": {"y": 2}})
        """
        assert evaluate_snippet(src) == {"a": 1, "nested": {"x": 1, "y": 2}}

    def test_import(self, tmp_path):
        (tmp_path / "base.jsonnet").write_text('{"a": 1, "b": {"c": 2}}')
        (tmp_path / "child.jsonnet").write_text(
            "local base = import 'base.jsonnet';\n"
            'std.mergePatch(base, {"b": {"d": 3}})'
        )
        result = evaluate_file(str(tmp_path / "child.jsonnet"))
        assert result == {"a": 1, "b": {"c": 2, "d": 3}}

    def test_string_with_tricky_contents(self):
        src = """{"url": "http://x//y", "hash": "a#b", "colon": "k: v"}"""
        assert evaluate_snippet(src) == {
            "url": "http://x//y", "hash": "a#b", "colon": "k: v"
        }


class TestShippedConfigs:
    @pytest.mark.parametrize(
        "rel",
        [
            "configs/vqa2/base_env.jsonnet",
            "configs/vqa2/few_shot_vqa_hotpotqa.jsonnet",
            "configs/vqa2/few_shot_vqa_frozen.jsonnet",
            "configs/vqa2/clip_cap.jsonnet",
            "configs/conceptual_captions/base_env.jsonnet",
            "configs/conceptual_captions/conceptual_captions.jsonnet",
            "configs/conceptual_captions/conceptual_captions_debug.jsonnet",
        ],
    )
    def test_all_configs_evaluate(self, rel):
        cfg = evaluate_file(os.path.join(REPO, rel))
        assert isinstance(cfg, dict)
        assert "model_config" in cfg and "data_loader" in cfg

    def test_flagship_schema(self):
        cfg = evaluate_file(
            os.path.join(REPO, "configs/vqa2/few_shot_vqa_hotpotqa.jsonnet")
        )
        assert cfg["model_config"]["ModelClass"] == "VCT0Prefix"
        assert cfg["model_config"]["model_args"]["prefix_length"] == 10
        assert cfg["model_config"]["model_args"]["prefix_size"] == 768
        mods = cfg["model_config"]["input_modules"]["module_list"]
        assert mods[0]["type"] == "QInput" and mods[0]["option"] == "hotpotqa"
        assert cfg["data_loader"]["dataset_modules"]["module_list"] == [
            "LoadClipEmbeddings", "LoadInContextExamples", "LoadVQA2Data",
        ]
        assert {m["name"] for m in cfg["metrics"]} == {
            "compute_vqa_scores", "write_predictions_to_file",
        }

    def test_frozen_inherits_hotpotqa(self):
        cfg = evaluate_file(
            os.path.join(REPO, "configs/vqa2/few_shot_vqa_frozen.jsonnet")
        )
        mods = cfg["model_config"]["input_modules"]["module_list"]
        assert mods[0]["option"] == "frozen"
        # inherited unchanged from hotpotqa
        assert cfg["model_config"]["model_args"]["prefix_length"] == 10


class TestProcessConfig:
    CFG = os.path.join(REPO, "configs/vqa2/few_shot_vqa_hotpotqa.jsonnet")

    def test_flags_threaded_into_data_loader(self):
        args = make_args(self.CFG, num_shots=4, no_prefix=1,
                         in_context_examples_fpath="/tmp/rices.pkl")
        config = process_config(args)
        assert config.data_loader.additional.num_shots == 4
        assert config.data_loader.additional.no_prefix == 1
        assert (
            config.data_loader.dataset_modules.module_dict
            .LoadInContextExamples.config.file_path == "/tmp/rices.pkl"
        )

    def test_derived_paths(self):
        config = process_config(make_args(self.CFG, mode="test"))
        assert config.experiment_path.endswith("few_shot_vqa_hotpotqa")
        assert config.saved_model_path.endswith("train/saved_model")
        assert "test_evaluation" in config.results_path

    def test_opts_literal_eval(self):
        args = make_args(
            self.CFG,
            opts=[
                "train.batch_size=8",
                "model_config.model_args.mapping_type=transformer",
                "valid.extra.deep.nested.flag=True",
                "data_loader.additional.max_target_length=10",
            ],
        )
        config = process_config(args)
        assert config.train.batch_size == 8
        assert config.model_config.model_args.mapping_type == "transformer"
        assert config.valid.extra.deep.nested.flag is True
        assert config.data_loader.additional.max_target_length == 10

    def test_opts_never_evals_code(self):
        args = make_args(self.CFG, opts=["experiment_name=__import__('os')"])
        config = process_config(args)
        # stays a string — ast.literal_eval refuses code
        assert config.experiment_name == "__import__('os')"


class TestAttrDict:
    def test_recursive_wrap_and_access(self):
        d = AttrDict({"a": {"b": [{"c": 1}]}})
        assert d.a.b[0].c == 1
        d.a.new = {"x": 2}
        assert d["a"]["new"]["x"] == 2

    def test_to_dict_roundtrip(self):
        d = AttrDict({"a": {"b": 1}, "l": [{"c": 2}]})
        plain = d.to_dict()
        assert plain == {"a": {"b": 1}, "l": [{"c": 2}]}
        assert type(plain["a"]) is dict
