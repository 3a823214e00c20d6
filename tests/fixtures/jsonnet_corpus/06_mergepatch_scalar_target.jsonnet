// a non-object target is treated as {} when the patch is an object
std.mergePatch(42, { a: null, b: 2 })
