// a non-object patch replaces the whole target
std.mergePatch({ a: 1 }, 'replaced')
