local t = importstr 'lib/base.libsonnet';
{ t: t }
