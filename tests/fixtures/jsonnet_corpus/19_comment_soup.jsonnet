// line comment
# hash comment
/* block
   comment */
{
  url: 'http://host/path#frag',  // '//' inside the string survives
  hash: 'a # not a comment',
  slash: "and /* neither */ this", /* trailing block */
  n: 1, // eol
}
