// Flagship few-shot VQA eval: frozen T0-3B + MLP mapper, hotpotqa prompt
// template, visual prefixes spliced at <extra_id_i> sentinels.
// Schema parity with reference configs/vqa2/few_shot_vqa_hotpotqa.jsonnet.
local base_env = import 'base_env.jsonnet';

local seed = 2021;

local override = {
  "experiment_name": "few_shot_vqa_hotpotqa",
  "seed": seed,
  "model_config": {
    "base_model": "T0_3B",
    "ModelClass": "VCT0Prefix",
    "TokenizerClass": "AutoTokenizer",
    "TokenizerModelVersion": "bigscience/T0_3B",
    "ConfigClass": "T0_3B",
    "pretrained": 1,
    "model_args": {
      "prefix_length": 10,
      "prefix_size": 768,  // CLIP ViT-L/14@336px embedding dim
      "mapping_type": "mlp",
      "model_version": "bigscience/T0_3B",
    },
    "input_modules": {
      "module_list": [
        {"type": "QInput", "option": "hotpotqa",
         "separation_tokens": {"start": "", "end": ""}},
        {"type": "EmbeddingInput", "option": "default"},
      ],
      "postprocess_module_list": [
        {"type": "PostProcessClipEmbeddings", "option": "default"},
        {"type": "PostProcessInputTokenization", "option": "generation"},
      ],
    },
    "decoder_input_modules": {"module_list": [], "postprocess_module_list": []},
    "output_modules": {
      "module_list": [
        {"type": "GenerationOutput", "option": "default"},
      ],
      "postprocess_module_list": [
        {"type": "PostProcessOutputTokenization", "option": "default"},
      ],
    },
  },
  "data_loader": {
    "type": "DataLoaderVQA2",
    "dataset_type": "VQA2Dataset",
    "additional": {
      "max_source_length": 1024,
      "max_decoder_source_length": 1024,
      "max_target_length": 20,
    },
    "dataset_modules": {
      "module_list": [
        "LoadClipEmbeddings",
        "LoadInContextExamples",
        "LoadVQA2Data",
      ],
    },
  },
  "train": {
    "type": "FewShotVQAExecutor",
    "batch_size": 32,
    "lr": 1e-4,
    "scheduler": "none",
    "additional": {
      "gradient_accumulation_steps": 4,
      "warmup_steps": 0,
      "gradient_clipping": 0,
    },
  },
  "valid": {"batch_size": 32, "step_size": 100},
  "test": {"batch_size": 32},
  "metrics": [
    {"name": "compute_vqa_scores"},
    {"name": "write_predictions_to_file"},
  ],
};

std.mergePatch(base_env, override)
