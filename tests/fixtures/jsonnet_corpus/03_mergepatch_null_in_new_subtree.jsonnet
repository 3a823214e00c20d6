# RFC 7386: a null inside a patch subtree the target lacks is dropped,
# the containing (now possibly empty) object is still created
std.mergePatch({}, { a: { b: null, c: 1 }, d: { e: null } })
