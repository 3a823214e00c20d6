local base = import 'lib/base.libsonnet';
{ lr_from_import: base.train.lr, depth: base.depth }
