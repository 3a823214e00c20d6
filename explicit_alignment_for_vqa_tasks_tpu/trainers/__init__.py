from .base_executor import BaseExecutor
from .checkpointing import (
    get_checkpoint_model_path,
    load_checkpoint,
    save_checkpoint,
)
from .clipcap_executor import ClipCapExecutor
from .few_shot_vqa_executor import FewShotVQAExecutor
from .metrics_processors import MetricsProcessor, TextCleaner
from .model_factory import build_model_from_config
from .optimization import make_optimizer, make_schedule
from .vct0_executor import VCT0Executor

__all__ = [
    "BaseExecutor",
    "ClipCapExecutor",
    "FewShotVQAExecutor",
    "MetricsProcessor",
    "TextCleaner",
    "VCT0Executor",
    "build_model_from_config",
    "get_checkpoint_model_path",
    "load_checkpoint",
    "make_optimizer",
    "make_schedule",
    "save_checkpoint",
]
