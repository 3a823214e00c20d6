{ e: std.extVar('nope') }
