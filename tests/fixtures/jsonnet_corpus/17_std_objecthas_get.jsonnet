local cfg = { present: 1 };
{ has: std.objectHas(cfg, 'present'),
  hasnt: std.objectHas(cfg, 'absent'),
  got: std.get(cfg, 'present', 0),
  fallback: std.get(cfg, 'absent', 'dflt') }
