{ joined: std.join('-', ['a', 'b', 'c']),
  joined_arrays: std.join([0], [[1], [2, 3]]),
  fmt: std.format('%s_%d', ['run', 7]),
  fmt_one: std.format('%d%%', [95]) }
