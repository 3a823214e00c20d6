std.mergePatch({ a: { b: 1 }, n: null }, { a: {} })
