// Debug base environment: dummy dataloader + tiny batches
// (reference configs/conceptual_captions/base_env_debug.jsonnet).
local base_env = import 'base_env.jsonnet';

local override = {
  "data_loader": {
    "dummy_dataloader": 1,
  },
  "train": {"batch_size": 4, "epochs": 2},
  "valid": {"batch_size": 4, "step_size": 10},
  "test": {"batch_size": 4},
};

std.mergePatch(base_env, override)
