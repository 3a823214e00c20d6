{ a: local y = 1; y }
