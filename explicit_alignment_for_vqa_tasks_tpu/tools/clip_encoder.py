"""Batched CLIP encoding on TPU — shared engine for the extraction tools
and the throughput benchmark.

The reference encodes images ONE AT A TIME through torch CLIP
(reference: src/tools/extract_contrastive_image_embeddings.py:58-65). Here
images are preprocessed host-side (PIL resize + center crop + normalize),
batched to a fixed size, and encoded with a jitted bf16 forward — one
compiled program, MXU-saturating batch, host/device overlap via simple
double buffering of the input batches.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Iterable, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def preprocess_image(image: "np.ndarray", image_size: int) -> np.ndarray:
    """Resize shorter side to image_size, center crop, normalize —
    OpenAI CLIP preprocessing. Input HWC uint8/float, output HWC float32."""
    from PIL import Image

    from ..models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    if image.shape[-1] == 4:
        image = image[..., :3]
    pil = Image.fromarray(np.asarray(image, dtype=np.uint8))
    w, h = pil.size
    scale = image_size / min(w, h)
    pil = pil.resize(
        (max(image_size, int(round(w * scale))),
         max(image_size, int(round(h * scale)))),
        Image.BICUBIC,
    )
    w, h = pil.size
    left = (w - image_size) // 2
    top = (h - image_size) // 2
    pil = pil.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(pil, dtype=np.float32) / 255.0
    mean = np.asarray(CLIP_IMAGE_MEAN, dtype=np.float32)
    std = np.asarray(CLIP_IMAGE_STD, dtype=np.float32)
    return (arr - mean) / std


def _check_encoder_mesh(mesh, batch_size: int):
    """Validate an optional extraction mesh (multi-chip bulk encode —
    the scale-past-one-chip twin of the reference's FAISS-GPU stages).
    Batches shard over the ``data`` axis, so the fixed batch size must
    divide it. Returns the mesh, or None when it is effectively 1-way."""
    if mesh is None:
        return None
    data = dict(mesh.shape).get("data", 1)
    if data <= 1:
        return None
    if batch_size % data != 0:
        raise ValueError(
            f"encoder batch_size {batch_size} must divide the mesh's "
            f"data={data} axis for sharded extraction"
        )
    return mesh


def _shard_encoder_batch(mesh, batch: np.ndarray):
    """Place a full fixed-size batch sharded over the data axis (no-op
    without a mesh)."""
    if mesh is None:
        return batch
    import jax

    from ..parallel.mesh import batch_sharding

    return jax.device_put(batch, batch_sharding(mesh))


class ClipImageEncoder:
    """Jitted batched image encoder with fixed batch size."""

    def __init__(
        self,
        cfg: Optional[Any] = None,
        params: Optional[Dict] = None,
        model_version: str = "openai/clip-vit-large-patch14-336",
        batch_size: int = 256,
        param_dtype: Any = None,
        use_pallas: bool = False,
        int8: bool = False,
        mesh: Optional[Any] = None,
    ):
        import functools

        import jax
        import jax.numpy as jnp

        from ..models.clip import (
            CLIPVisionConfig,
            clip_encode_image,
            init_clip_vision_params,
        )

        self.cfg = cfg or CLIPVisionConfig.vit_l_14_336()
        self.mesh = _check_encoder_mesh(mesh, batch_size)
        self.batch_size = batch_size
        param_dtype = param_dtype or jnp.bfloat16
        if (int8 or self.cfg.fused_block) and self.cfg.seq_len > 128:
            # the long-sequence fused/int8 kernels (ViT-L) hold MLP weights
            # in VMEM beyond the 16 MB scoped default; must be raised
            # BEFORE any jax computation initializes the backend (param
            # init below counts) — a too-late call logs a warning and the
            # first encode would fail to compile with an opaque XLA error
            from ..utils.tpu_flags import ensure_scoped_vmem_limit

            if not ensure_scoped_vmem_limit(65536) and \
                    jax.default_backend() != "cpu":
                raise RuntimeError(
                    "fused_block/int8 at seq_len "
                    f"{self.cfg.seq_len} needs a raised scoped-VMEM limit, "
                    "but a JAX backend already initialized without it; "
                    "construct ClipImageEncoder before any other JAX use "
                    "or set LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_"
                    "kib=65536 in the environment"
                )
        if params is None:
            params = self._try_load_hf(model_version, param_dtype)
        if params is None:
            logger.warning(
                "no local CLIP weights for %r; random init (embeddings will "
                "not be meaningful — fine for perf/pipeline tests)",
                model_version,
            )
            params = init_clip_vision_params(
                jax.random.PRNGKey(0), self.cfg, param_dtype
            )
        self.params = params
        if int8:
            # opt-in int8 bulk-extraction mode (cosine vs bf16 ~0.9995+;
            # see ops/fused_attention_block.fused_vit_block_q8)
            import dataclasses

            from ..models.clip import quantize_vision_blocks

            self.params = dict(params)  # don't mutate the caller's dict
            self.params["blocks_q8"] = quantize_vision_blocks(self.params)
            self.cfg = dataclasses.replace(self.cfg, int8=True)

        if self.mesh is not None:
            from ..parallel.mesh import replicate_params

            self.params = replicate_params(self.mesh, self.params)

        @functools.partial(jax.jit, static_argnames=())
        def encode(params, images):
            return clip_encode_image(
                params, self.cfg, images, use_pallas=use_pallas
            )

        self._encode = encode

    def _try_load_hf(self, model_version: str, param_dtype) -> Optional[Dict]:
        try:
            import jax
            import jax.numpy as jnp
            import transformers

            from ..models.hf_convert import clip_vision_params_from_hf

            model = transformers.CLIPVisionModelWithProjection.from_pretrained(
                model_version, local_files_only=True
            )
            params = clip_vision_params_from_hf(model.state_dict(), self.cfg)
            del model
            return jax.tree.map(
                lambda x: jnp.asarray(x, dtype=param_dtype), params
            )
        except Exception as exc:
            logger.info("local CLIP weights unavailable: %s", exc)
            return None

    def encode_batch(self, images: np.ndarray) -> np.ndarray:
        """(B<=batch_size, H, W, 3) preprocessed float -> (B, proj_dim)."""
        n = images.shape[0]
        if n < self.batch_size:
            pad = self.batch_size - n
            images = np.concatenate(
                [images, np.zeros((pad, *images.shape[1:]), images.dtype)]
            )
        images = _shard_encoder_batch(self.mesh, images)
        out = np.asarray(self._encode(self.params, images),
                         dtype=np.float32)
        return out[:n]

    def encode_iter(
        self, items: Iterable[Tuple[Any, np.ndarray]]
    ) -> Iterable[Tuple[Any, np.ndarray]]:
        """Stream (key, preprocessed image) pairs; yields (key, embedding)."""
        keys: List[Any] = []
        batch: List[np.ndarray] = []
        for key, image in items:
            keys.append(key)
            batch.append(image)
            if len(batch) == self.batch_size:
                embeddings = self.encode_batch(np.stack(batch))
                yield from zip(keys, embeddings)
                keys, batch = [], []
        if batch:
            embeddings = self.encode_batch(np.stack(batch))
            yield from zip(keys, embeddings)


class ClipTextEncoder:
    """Jitted batched text encoder (for question embeddings / RICES)."""

    def __init__(
        self,
        cfg: Optional[Any] = None,
        params: Optional[Dict] = None,
        model_version: str = "openai/clip-vit-large-patch14-336",
        batch_size: int = 512,
        param_dtype: Any = None,
        mesh: Optional[Any] = None,
    ):
        import functools

        import jax
        import jax.numpy as jnp

        from ..models.clip import (
            CLIPTextConfig,
            clip_encode_text,
            init_clip_text_params,
        )

        self.cfg = cfg or CLIPTextConfig()
        self.mesh = _check_encoder_mesh(mesh, batch_size)
        self.batch_size = batch_size
        param_dtype = param_dtype or jnp.bfloat16
        self.tokenizer = self._try_load_tokenizer(model_version)
        if params is None:
            params = self._try_load_hf(model_version, param_dtype)
        if params is None:
            logger.warning("no local CLIP text weights; random init")
            params = init_clip_text_params(
                jax.random.PRNGKey(0), self.cfg, param_dtype
            )
        self.params = params
        if self.mesh is not None:
            from ..parallel.mesh import replicate_params

            self.params = replicate_params(self.mesh, self.params)

        @functools.partial(jax.jit)
        def encode(params, ids):
            return clip_encode_text(params, self.cfg, ids)

        self._encode = encode

    def _try_load_tokenizer(self, model_version: str):
        try:
            import transformers

            return transformers.CLIPTokenizerFast.from_pretrained(
                model_version, local_files_only=True
            )
        except Exception as exc:
            logger.info("local CLIP tokenizer unavailable: %s", exc)
            return None

    def _try_load_hf(self, model_version: str, param_dtype):
        try:
            import jax
            import jax.numpy as jnp
            import transformers

            from ..models.hf_convert import clip_text_params_from_hf

            model = transformers.CLIPTextModelWithProjection.from_pretrained(
                model_version, local_files_only=True
            )
            params = clip_text_params_from_hf(model.state_dict(), self.cfg)
            del model
            return jax.tree.map(
                lambda x: jnp.asarray(x, dtype=param_dtype), params
            )
        except Exception as exc:
            logger.info("local CLIP text weights unavailable: %s", exc)
            return None

    def tokenize(self, texts: List[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise RuntimeError(
                "CLIP tokenizer not available locally; pass token ids "
                "directly to encode_ids"
            )
        enc = self.tokenizer(
            texts, padding="max_length",
            max_length=self.cfg.context_length, truncation=True,
            return_tensors="np",
        )
        return np.asarray(enc["input_ids"], dtype=np.int32)

    def encode_ids(self, input_ids: np.ndarray) -> np.ndarray:
        n = input_ids.shape[0]
        if n < self.batch_size:
            pad = self.batch_size - n
            input_ids = np.concatenate(
                [input_ids,
                 np.zeros((pad, input_ids.shape[1]), input_ids.dtype)]
            )
        input_ids = _shard_encoder_batch(self.mesh, input_ids)
        out = np.asarray(self._encode(self.params, input_ids),
                         dtype=np.float32)
        return out[:n]

    def encode_texts(self, texts: List[str]) -> np.ndarray:
        out = []
        for start in range(0, len(texts), self.batch_size):
            ids = self.tokenize(texts[start:start + self.batch_size])
            out.append(self.encode_ids(ids))
        return np.concatenate(out) if out else np.zeros((0,))
