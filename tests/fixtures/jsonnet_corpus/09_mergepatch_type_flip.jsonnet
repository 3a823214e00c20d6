// patch flips a scalar to an object and an object to a scalar
std.mergePatch({ a: 5, b: { deep: true } }, { a: { now: 'obj' }, b: 7 })
