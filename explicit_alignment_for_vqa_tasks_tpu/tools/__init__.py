from .clip_encoder import ClipImageEncoder, ClipTextEncoder, preprocess_image

__all__ = ["ClipImageEncoder", "ClipTextEncoder", "preprocess_image"]
