local x = if true then 1 else 2;
{ a: x }
