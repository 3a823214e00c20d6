"""fast_attention (bf16 scores) numerics vs the fp32 default."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.clip import (  # noqa: E402
    CLIPVisionConfig,
    clip_encode_image,
    init_clip_vision_params,
)


def test_fast_attention_close_to_exact():
    cfg = CLIPVisionConfig.small_test()
    params = init_clip_vision_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((4, 28, 28, 3)).astype(np.float32)
    )
    exact = np.asarray(clip_encode_image(params, cfg, images))
    fast_cfg = dataclasses.replace(cfg, fast_attention=True)
    fast = np.asarray(clip_encode_image(params, fast_cfg, images))
    # bf16 scores introduce small relative error; embeddings must remain
    # close (cosine similarity ~1)
    cos = (exact * fast).sum(-1) / (
        np.linalg.norm(exact, axis=-1) * np.linalg.norm(fast, axis=-1)
    )
    assert np.all(cos > 0.999), cos


def test_fused_attention_core_long_sequence():
    # patch 2 @ 28px -> 197 tokens: exercises the >128-token core path
    cfg = CLIPVisionConfig.small_test(patch_size=2)
    params = init_clip_vision_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    rng = np.random.default_rng(4)
    images = jnp.asarray(
        rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    )
    exact = np.asarray(clip_encode_image(params, cfg, images))
    fused_cfg = dataclasses.replace(cfg, fused_attention=True)
    fused = np.asarray(clip_encode_image(params, fused_cfg, images))
    np.testing.assert_allclose(fused, exact, rtol=2e-4, atol=2e-4)


def test_fused_attention_matches_exact():
    cfg = CLIPVisionConfig.small_test()
    params = init_clip_vision_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    rng = np.random.default_rng(2)
    images = jnp.asarray(
        rng.standard_normal((4, 28, 28, 3)).astype(np.float32)
    )
    exact = np.asarray(clip_encode_image(params, cfg, images))
    fused_cfg = dataclasses.replace(cfg, fused_attention=True)
    fused = np.asarray(clip_encode_image(params, fused_cfg, images))
    np.testing.assert_allclose(fused, exact, rtol=2e-4, atol=2e-4)
