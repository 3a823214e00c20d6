{ a: true && false }
