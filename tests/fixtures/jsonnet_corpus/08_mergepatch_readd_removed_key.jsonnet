local l1 = std.mergePatch({ k: 'v0', other: 1 }, { k: null });
std.mergePatch(l1, { k: 'v2' })
