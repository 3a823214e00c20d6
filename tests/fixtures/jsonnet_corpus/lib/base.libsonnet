local grand = import 'grandbase.libsonnet';
// a local here must NOT leak into importers
local hidden_local = 'invisible';
std.mergePatch(grand, { depth: 'base', base_only: hidden_local })
