// Debug variant: dummy dataloader (tiny data), small batch
// (reference configs/conceptual_captions/conceptual_captions_debug.jsonnet).
local cc = import 'conceptual_captions.jsonnet';

local override = {
  "experiment_name": "vct0_conceptual_captions_mlp_debug",
  "data_loader": {
    "dummy_dataloader": 1,
  },
  "train": {"batch_size": 4},
  "valid": {"batch_size": 4},
  "test": {"batch_size": 4},
};

std.mergePatch(cc, override)
