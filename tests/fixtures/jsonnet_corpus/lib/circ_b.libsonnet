local back = import '../err_17_circular_import.jsonnet';
back
