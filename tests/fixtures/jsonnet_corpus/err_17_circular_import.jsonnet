local other = import 'lib/circ_b.libsonnet';
other
