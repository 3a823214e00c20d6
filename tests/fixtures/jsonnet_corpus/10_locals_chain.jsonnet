local a = { x: 1, y: { z: 'deep' } };
local b = a.y;
local c = b.z;
{ got: c, twice: c + c, via: a.y.z }
