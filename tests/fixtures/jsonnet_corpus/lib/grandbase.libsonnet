// bottom of the import chain
{ depth: 'grand', grand_only: true, train: { lr: 1, bs: 1 } }
