local env = std.extVar('env');
{ mode: env, path: '/runs/' + env }
