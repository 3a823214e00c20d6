// arrays are replaced wholesale, never element-merged
std.mergePatch({ xs: [1, 2, 3], o: { xs: [9] } },
               { xs: [4], o: { xs: [] } })
