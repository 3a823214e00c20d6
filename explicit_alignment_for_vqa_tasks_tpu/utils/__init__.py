from .attr_dict import AttrDict
from .config_system import (
    get_config_from_file,
    parse_optional_args,
    process_config,
    save_config,
)
from .jsonnet_eval import evaluate_file, evaluate_snippet, merge_patch

__all__ = [
    "AttrDict",
    "get_config_from_file",
    "parse_optional_args",
    "process_config",
    "save_config",
    "evaluate_file",
    "evaluate_snippet",
    "merge_patch",
]
