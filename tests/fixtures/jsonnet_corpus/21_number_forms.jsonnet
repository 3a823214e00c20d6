{ f: 0.25, e: 1e3, em: 1.5e-2, neg: -42, zero: 0,
  sum: 0.5 + 0.25 }
