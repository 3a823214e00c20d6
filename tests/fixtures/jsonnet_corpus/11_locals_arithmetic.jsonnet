local n_gpus = 4;
local per_device = 8;
local global_batch = n_gpus * per_device;
local half = global_batch / 2;
local off_by = global_batch - 1;
{ global_batch: global_batch, half: half, off_by: off_by,
  scaled: 1.5e2 + 0.5, neg: -3 + 1 }
