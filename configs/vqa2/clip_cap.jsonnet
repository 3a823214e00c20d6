// ClipCap path: GPT-2 + mapping network trained/evaluated on VQA2
// (reference configs/vqa2/clip_cap.jsonnet).
local base_env = import 'base_env.jsonnet';

local override = {
  "experiment_name": "clip_cap_vqa2",
  "model_config": {
    "base_model": "GPT2",
    "ModelClass": "ClipCaptionPrefix",
    "TokenizerClass": "GPT2Tokenizer",
    "TokenizerModelVersion": "gpt2",
    "ConfigClass": "GPT2",
    "ModelVersion": "gpt2",
    "pretrained": 1,
    "model_args": {
      "prefix_length": 10,
      "clip_length": 10,
      "prefix_size": 512,  // CLIP ViT-B/32 embedding dim
      "mapping_type": "mlp",
      "model_version": "gpt2",
    },
    "SPECIAL_TOKENS": {
      "bos_token": "<|beginofanswer|>",
      "additional_special_tokens": [],
    },
    "input_modules": {
      "module_list": [
        {"type": "QAInput", "option": "default",
         "separation_tokens": {"start": "question:", "end": "answer:"}},
        {"type": "EmbeddingInput", "option": "default"},
      ],
      "postprocess_module_list": [
        {"type": "PostProcessInputTokenization", "option": "default"},
        {"type": "PostProcessClipEmbeddings", "option": "default"},
      ],
    },
    "decoder_input_modules": {
      "module_list": [
        {"type": "QuestionInput", "option": "default",
         "separation_tokens": {"start": "question:", "end": "answer:"}},
      ],
      "postprocess_module_list": [
        {"type": "PostProcessInputTokenization", "option": "generation"},
      ],
    },
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
    "dataset_modules": {
      "module_list": [
        "LoadClipEmbeddings",
        "LoadVQA2Data",
      ],
    },
  },
  "train": {
    "type": "ClipCapExecutor",
    "batch_size": 32,
    "lr": 2e-5,
    "scheduler": "linear",
    "additional": {
      "gradient_accumulation_steps": 4,
      "warmup_steps": 5000,
      "gradient_clipping": 0,
    },
  },
  "metrics": [
    {"name": "compute_vqa_scores"},
    {"name": "write_predictions_to_file"},
  ],
};

std.mergePatch(base_env, override)
