{ a: { b: $.top }, top: 1 }
