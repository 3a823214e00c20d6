{ s: |||
  text
||| }
