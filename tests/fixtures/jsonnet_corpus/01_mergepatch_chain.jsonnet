// three-layer inheritance chain, like base_env -> task -> experiment
local base = {
  train: { lr: 0.001, batch_size: 8, sched: { type: 'linear', warmup: 100 } },
  tags: ['base'],
  keep: 'yes',
};
local task = std.mergePatch(base, {
  train: { batch_size: 32, sched: { warmup: 0 } },
  tags: ['task'],
});
std.mergePatch(task, { train: { lr: 0.01 }, extra: true })
