if true then error 'boom' else {}
