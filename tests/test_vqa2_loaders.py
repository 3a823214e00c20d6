"""VinVL / OCR / caption dataset-module loaders with tiny fixtures, plus
the TextBasedVisionInput parser over their outputs."""

import json

import pytest

from explicit_alignment_for_vqa_tasks_tpu.data.data_loader_vqa2 import (
    DataLoaderVQA2,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.attr_dict import AttrDict


def base_config(tmp_path):
    return AttrDict(
        mode="test",
        seed=0,
        cache={"default_folder": str(tmp_path / "cache"), "regenerate": {}},
        model_config={
            "TokenizerClass": "SimpleTokenizer",
            "TokenizerModelVersion": "",
            "SPECIAL_TOKENS": {"additional_special_tokens": []},
        },
        data_loader={
            "type": "DataLoaderVQA2", "dataset_type": "VQA2Dataset",
            "dummy_dataloader": 0,
            "additional": {"max_source_length": 64,
                           "max_decoder_source_length": 64,
                           "max_target_length": 8, "num_shots": 0},
            "dataset_modules": {"module_list": [], "module_dict": {}},
        },
        train={"batch_size": 2}, valid={"batch_size": 2},
        test={"batch_size": 2},
    )


def write_vinvl_tsv(tmp_path, name, entries):
    path = tmp_path / name
    with open(path, "w") as fh:
        for image_key, prediction in entries:
            fh.write(f"{image_key}\t{json.dumps(prediction)}\n")
    return str(path)


class TestVinVLAndOCR:
    def test_vinvl_loading_and_ocr_matching(self, tmp_path):
        prediction = {
            "objects": [
                {"rect": [0, 0, 100, 100], "class": "sign", "conf": 0.9,
                 "attributes": ["red", "large"],
                 "attribute_scores": [0.8, 0.2]},
                {"rect": [200, 200, 250, 250], "class": "car", "conf": 0.8,
                 "attributes": [], "attribute_scores": []},
            ]
        }
        tsv = write_vinvl_tsv(
            tmp_path, "pred.tsv", [("img1", prediction)]
        )
        ocr_dir = tmp_path / "ocr"
        ocr_dir.mkdir()
        (ocr_dir / "img1_ocr.json").write_text(json.dumps({
            "filtered_text_annotations": [
                {"description": "STOP", "vertices":
                 [[10, 10], [50, 10], [50, 30], [10, 30]]},
                {"description": "far away", "vertices":
                 [[500, 500], [600, 500], [600, 520], [500, 520]]},
            ]
        }))

        config = base_config(tmp_path)
        loader = DataLoaderVQA2(config)
        loader.LoadVinVLFeatures(AttrDict(
            type="LoadVinVLFeatures", option="default",
            config={"train": tsv, "test": tsv},
        ))
        assert "img1" in loader.data.vinvl_features

        loader.LoadGoogleOCRFeatures(AttrDict(
            type="LoadGoogleOCRFeatures", option="default",
            config={"train": str(ocr_dir), "test": str(ocr_dir),
                    "combine_with_vinvl": True},
        ))
        objects = loader.data.vinvl_features["img1"]["objects"]
        # "STOP" polygon lies inside the sign box -> attached with a score
        sign_ocr = objects[0].get("ocr", [])
        assert len(sign_ocr) == 1
        assert sign_ocr[0]["text"] == "STOP"
        assert 0 < sign_ocr[0]["score"] <= 1
        # the far-away polygon matches no box
        assert "ocr" not in objects[1] or objects[1].get("ocr") == []

    def test_caption_features(self, tmp_path):
        cap = tmp_path / "captions.json"
        cap.write_text(json.dumps({"img1": "a stop sign on a street"}))
        config = base_config(tmp_path)
        loader = DataLoaderVQA2(config)
        loader.LoadOscarCaptionFeatures(AttrDict(
            type="LoadOscarCaptionFeatures", option="default",
            config={"train": str(cap)},
        ))
        assert loader.data.caption_features["img1"].startswith("a stop")


class TestTextBasedVisionInput:
    def test_object_option_with_attributes_and_ocr(self, tmp_path):
        from explicit_alignment_for_vqa_tasks_tpu.data.module_parser import (
            ModuleParser,
        )

        class Host(ModuleParser):
            config = base_config(tmp_path)

        sample = AttrDict(
            objects=[
                {"class": "sign", "attributes": ["red", "big"],
                 "attribute_scores": [0.9, 0.1]},
            ],
            img_ocr=[
                {"description": "STOP"},
                {"description": "STOP"},        # duplicate, de-duplicated
                {"description": "Main\nSt"},    # newline normalized
            ],
        )
        module = AttrDict(
            type="TextBasedVisionInput", option="object",
            attribute_max=2, attribute_thres=0.5, ocr=1,
            separation_tokens={"start": "<obj>", "sep": ";", "end": "</obj>"},
        )
        out = Host().TextBasedVisionInput(sample, module)
        assert out.text_sequence == (
            "<obj> red sign ; STOP Main St </obj>"
        )

    def test_caption_option(self, tmp_path):
        from explicit_alignment_for_vqa_tasks_tpu.data.module_parser import (
            ModuleParser,
        )

        class Host(ModuleParser):
            config = base_config(tmp_path)

        sample = AttrDict(img_caption={"caption": "a dog runs"})
        module = AttrDict(
            type="TextBasedVisionInput", option="caption",
            separation_tokens={"start": "caption:", "end": "."},
        )
        out = Host().TextBasedVisionInput(sample, module)
        assert out.text_sequence == "caption: a dog runs ."
