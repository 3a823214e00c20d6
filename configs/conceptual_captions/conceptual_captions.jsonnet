// Mapping-network training on Conceptual Captions (captioning loss over a
// frozen T0-3B; reference configs/conceptual_captions/conceptual_captions.jsonnet).
local base_env = import 'base_env.jsonnet';

local override = {
  "experiment_name": "vct0_conceptual_captions_mlp",
  "train": {
    "type": "VCT0Executor",
    "batch_size": 32,
    "lr": 1e-4,
    "scheduler": "none",
  },
  "metrics": [],
};

std.mergePatch(base_env, override)
