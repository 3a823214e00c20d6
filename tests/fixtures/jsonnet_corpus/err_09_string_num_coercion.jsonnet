{ s: 'run' + 3 }
