// Base environment for Conceptual Captions mapping-network training
// (schema parity with reference configs/conceptual_captions/base_env.jsonnet).
local train_batch_size = 32;
local valid_batch_size = 32;
local test_batch_size = 32;
local valid_step_size = 100;
local save_interval = 1;
local train_epochs = 9999;
local adam_epsilon = 1e-08;
local lr = 1e-4;
local gradient_accumulation_steps = 4;
local gradient_clipping = 0;
local warmup_steps = 0;
local seed = 2021;

local default_cache_folder = '../data/conceptual_captions/cache';

local conceptual_captions = {
  "train": "../data/conceptual_captions/pre-extracted-features/conceptual_captions_ViT-L_14@336px_train.parquet",
  "val": "../data/conceptual_captions/pre-extracted-features/conceptual_captions_ViT-L_14@336px_validation.parquet",
};

{
  "DATA_FOLDER": "",
  "EXPERIMENT_FOLDER": "",
  "TENSORBOARD_FOLDER": "",
  "WANDB": {
    "CACHE_DIR": "",
    "entity": "",
    "project": "explicit-alignment-tpu",
    "tags": [],
  },
  "platform_type": "jax",
  "ignore_pretrained_weights": [],
  "experiment_name": "default_train",
  "seed": seed,
  "model_config": {
    "base_model": "T0_3B",
    "ModelClass": "VCT0Prefix",
    "TokenizerClass": "AutoTokenizer",
    "TokenizerModelVersion": "bigscience/T0_3B",
    "ConfigClass": "T0_3B",
    "ModelVersion": "",
    "pretrained": 1,
    "modules": [],
    "model_args": {
      "prefix_length": 10,
      "prefix_size": 768,
      "mapping_type": "mlp",
      "model_version": "bigscience/T0_3B",
    },
    "SPECIAL_TOKENS": {
      "additional_special_tokens": [],
    },
    "input_modules": {"module_list": [], "postprocess_module_list": []},
    "decoder_input_modules": {"module_list": [], "postprocess_module_list": []},
    "output_modules": {"module_list": [], "postprocess_module_list": []},
  },
  "tpu": {
    // Device mesh axes for pjit; -1 = "all remaining devices". Setting
    // "pipe" > 1 builds a 3-D (data, pipe, model) mesh and trains through
    // the GPipe pipeline (parallel/pipeline.py); "n_micro" sets the
    // microbatch count and "sequence_parallel" sequence-shards the
    // residual stream over the model axis inside stages.
    // Multi-slice: "dcn_data" > 1 adds the outer DCN axis
    // (docs/scaling.md); executor-driven multi-controller training
    // is certified in tests/test_multiprocess_executor_train.py.
    "mesh": {"data": -1, "pipe": 1, "model": 1},
    "n_micro": 2,
    "sequence_parallel": false,
    "compute_dtype": "bfloat16",
    "params_dtype": "bfloat16",
    "length_buckets": [32, 64, 128],
    "remat": false,
  },
  "cache": {
    "default_folder": default_cache_folder,
    "regenerate": {
      "train_data_preprocessed": 0,
      "val_data_preprocessed": 0,
    },
  },
  "data_loader": {
    "type": "DataLoaderConceptualCaptions",
    "dataset_type": "ConceptualCaptionsDataset",
    "dummy_dataloader": 0,
    "additional": {
      "max_source_length": 32,
      "max_decoder_source_length": 32,
      "max_target_length": 32,
      "num_shots": 0,
    },
    "dataset_modules": {
      "module_list": ["LoadConceptualCaptions"],
      "module_dict": {
        "LoadConceptualCaptions": {
          "type": "LoadConceptualCaptions", "option": "default",
          "config": conceptual_captions,
        },
      },
    },
  },
  "cuda": 0,
  "gpu_device": 0,
  "train": {
    "type": "VCT0Executor",
    "epochs": train_epochs,
    "batch_size": train_batch_size,
    "lr": lr,
    "adam_epsilon": adam_epsilon,
    "load_epoch": -1,
    "load_model_path": "",
    "load_best_model": 0,
    "save_interval": save_interval,
    "scheduler": "none",
    "additional": {
      "gradient_accumulation_steps": gradient_accumulation_steps,
      "warmup_steps": warmup_steps,
      "gradient_clipping": gradient_clipping,
      "save_top_k": -1,
      "save_top_k_metric": "valid/loss",
      "save_top_k_mode": "min",
    },
  },
  "valid": {
    "batch_size": valid_batch_size,
    "step_size": valid_step_size,
    "break_interval": 3000,
    "additional": {},
  },
  "test": {
    "evaluation_name": "test_evaluation",
    "load_epoch": -1,
    "load_model_path": "",
    "load_best_model": 0,
    "batch_size": test_batch_size,
    "num_evaluation": 0,
    "additional": {"multiprocessing": 4},
  },
  "metrics": [],
}
