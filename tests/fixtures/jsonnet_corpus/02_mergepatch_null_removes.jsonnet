local base = { a: 1, b: { c: 2, d: 3 }, e: 'kept' };
std.mergePatch(base, { a: null, b: { c: null } })
