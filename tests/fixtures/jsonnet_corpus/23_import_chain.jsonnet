local base = import 'lib/base.libsonnet';
std.mergePatch(base, { depth: 'leaf', train: { bs: 64 } })
