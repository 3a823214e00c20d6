"""int8 whole-ViT-block kernel: quantization helpers + tower cosine
parity vs the fp32/bf16 paths (interpret mode on CPU)."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.clip import (  # noqa: E402
    CLIPVisionConfig,
    clip_encode_image,
    init_clip_vision_params,
    quantize_vision_blocks,
)
from explicit_alignment_for_vqa_tasks_tpu.ops.fused_attention_block import (  # noqa: E402
    quantize_weight_i8,
)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((32, 48)).astype(np.float32) * 0.1
    q, s = quantize_weight_i8(w)
    assert q.dtype == np.int8 and s.shape == (48,)
    deq = q.astype(np.float32) * s
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01, rel  # <=1/254 per-channel quant step


def test_int8_tower_cosine_close_to_exact():
    cfg = CLIPVisionConfig.small_test()
    params = init_clip_vision_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    params["blocks_q8"] = quantize_vision_blocks(params)
    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.standard_normal((4, 28, 28, 3)).astype(np.float32)
    )
    exact = np.asarray(clip_encode_image(params, cfg, images))
    q8_cfg = dataclasses.replace(cfg, int8=True, fused_block_group=2)
    got = np.asarray(clip_encode_image(params, q8_cfg, images))
    cos = (exact * got).sum(-1) / (
        np.linalg.norm(exact, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert np.all(cos > 0.995), cos


def test_int8_requires_quantized_blocks():
    # without blocks_q8 the int8 flag silently falls through to the
    # default path (exactness preserved)
    cfg = CLIPVisionConfig.small_test()
    params = init_clip_vision_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    rng = np.random.default_rng(3)
    images = jnp.asarray(
        rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    )
    exact = np.asarray(clip_encode_image(params, cfg, images))
    q8_cfg = dataclasses.replace(cfg, int8=True)
    got = np.asarray(clip_encode_image(params, q8_cfg, images))
    np.testing.assert_allclose(got, exact, rtol=1e-6, atol=1e-6)


def test_int8_long_sequence_tower_cosine():
    # patch 2 @ 28px -> 197 tokens > 128: the attention-core +
    # int8-fused-MLP split path
    cfg = CLIPVisionConfig.small_test(patch_size=2)
    params = init_clip_vision_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    params["blocks_q8"] = quantize_vision_blocks(params)
    rng = np.random.default_rng(5)
    images = jnp.asarray(
        rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    )
    exact = np.asarray(clip_encode_image(params, cfg, images))
    q8_cfg = dataclasses.replace(cfg, int8=True)
    got = np.asarray(clip_encode_image(params, q8_cfg, images))
    cos = (exact * got).sum(-1) / (
        np.linalg.norm(exact, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert np.all(cos > 0.995), cos


def test_clip_image_encoder_int8_roundtrip():
    from explicit_alignment_for_vqa_tasks_tpu.tools.clip_encoder import (
        ClipImageEncoder,
    )

    cfg = CLIPVisionConfig.small_test()
    params = init_clip_vision_params(jax.random.PRNGKey(9), cfg, jnp.float32)
    base = ClipImageEncoder(cfg=cfg, params=params, batch_size=4)
    enc = ClipImageEncoder(cfg=cfg, params=params, batch_size=4, int8=True)
    # caller's dict must NOT be mutated
    assert "blocks_q8" not in params
    assert enc.cfg.int8 and "blocks_q8" in enc.params
    rng = np.random.default_rng(10)
    images = rng.standard_normal((4, 28, 28, 3)).astype(np.float32)
    a = np.asarray(base.encode_batch(images))
    b = np.asarray(enc.encode_batch(images))
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert np.all(cos > 0.995), cos
