{
  bare_key: 1,
  'quoted-key': 2,
  "double": [1, 2, 3,],
  nested: { deep: { deeper: null, }, },
}
