{ s: std.length('hello'), a: std.length([1, 2]),
  o: std.length({ a: 1, b: 2 }),
  ts_num: std.toString(12), ts_bool: std.toString(true),
  ts_str: std.toString('x'), ts_arr: std.toString([1, 2]) }
