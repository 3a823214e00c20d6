from .clip import (
    CLIPTextConfig,
    CLIPVisionConfig,
    clip_encode_image,
    clip_encode_text,
    init_clip_text_params,
    init_clip_vision_params,
    normalize_images,
)
from .clipcap import (
    ClipCapConfig,
    ClipCaptionModel,
    clipcap_loss,
    init_clipcap_params,
)
from .gpt2 import GPT2Config, gpt2_forward, init_gpt2_params
from .mappers import MapperConfig, init_mapper, mapper_apply
from .t5 import T5Config, init_t5_params, t5_decode, t5_encode, t5_forward_loss
from .vct0 import (
    VCT0Config,
    VCT0Model,
    init_vct0_params,
    project_prefix,
    vct0_caption_loss,
)

__all__ = [
    "CLIPTextConfig",
    "CLIPVisionConfig",
    "ClipCapConfig",
    "ClipCaptionModel",
    "GPT2Config",
    "MapperConfig",
    "T5Config",
    "VCT0Config",
    "VCT0Model",
    "clip_encode_image",
    "clip_encode_text",
    "clipcap_loss",
    "gpt2_forward",
    "init_clip_text_params",
    "init_clip_vision_params",
    "init_clipcap_params",
    "init_gpt2_params",
    "init_mapper",
    "init_t5_params",
    "init_vct0_params",
    "mapper_apply",
    "normalize_images",
    "project_prefix",
    "t5_decode",
    "t5_encode",
    "t5_forward_loss",
    "vct0_caption_loss",
]
