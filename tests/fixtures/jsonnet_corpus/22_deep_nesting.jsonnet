local leaf = { v: 'bottom' };
local l5 = { l6: leaf };
local l4 = { l5: l5 };
std.mergePatch({ l1: { l2: { l3: { l4: l4 } } } },
               { l1: { l2: { l3: { l4: { l5: { l6: { v: 'patched' } } } } } } })
