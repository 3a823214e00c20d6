local lr = 0.001;
local schedule = { lr: lr, name: 'constant' };
local override = std.mergePatch(schedule, { lr: lr * 10 });
override
