"""Component registries: population and error behavior."""

import pytest

import explicit_alignment_for_vqa_tasks_tpu.main  # noqa: F401 — registers
from explicit_alignment_for_vqa_tasks_tpu.registry import (
    DATA_LOADERS,
    DATASETS,
    EXECUTORS,
    MODELS,
    Registry,
)


class TestRegistries:
    def test_config_facing_names_registered(self):
        # the class-name strings used in config files must resolve
        assert "DataLoaderVQA2" in DATA_LOADERS
        assert "DataLoaderConceptualCaptions" in DATA_LOADERS
        assert "VQA2Dataset" in DATASETS
        for name in ("FewShotVQAExecutor", "VCT0Executor", "ClipCapExecutor"):
            assert name in EXECUTORS
        for name in ("VCT0Prefix", "VCT0Model", "ClipCaptionPrefix",
                     "ClipCaptionModel"):
            assert name in MODELS

    def test_unknown_name_lists_known(self):
        with pytest.raises(KeyError, match="DataLoaderVQA2"):
            DATA_LOADERS.get("NoSuchLoader")

    def test_duplicate_registration_rejected(self):
        reg = Registry("thing")

        @reg.register("x")
        def a():
            pass

        with pytest.raises(KeyError, match="duplicate"):
            @reg.register("x")
            def b():
                pass
