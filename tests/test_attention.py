"""Pallas fused attention vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.ops.attention import (  # noqa: E402
    flash_attention,
)


def reference_attention(q, k, v, bias=None):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def make_qkv(B=2, L=64, H=4, D=16, seed=0, lk=None):
    rng = np.random.default_rng(seed)
    lk = lk or L
    q = rng.standard_normal((B, L, H, D)).astype(np.float32)
    k = rng.standard_normal((B, lk, H, D)).astype(np.float32)
    v = rng.standard_normal((B, lk, H, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestFlashAttention:
    def test_matches_reference_no_bias(self):
        q, k, v = make_qkv()
        got = flash_attention(q, k, v)
        want = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_reference_with_mask_bias(self):
        q, k, v = make_qkv(seed=1)
        mask = np.zeros((2, 1, 1, 64), dtype=np.float32)
        mask[:, :, :, 50:] = -1e9
        got = flash_attention(q, k, v, bias=jnp.asarray(mask))
        want = reference_attention(q, k, v, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_causal_via_bias(self):
        q, k, v = make_qkv(seed=2, L=32)
        causal = jnp.where(
            jnp.tril(jnp.ones((32, 32), dtype=bool))[None, None], 0.0, -1e9
        )
        got = flash_attention(q, k, v, bias=causal)
        want = reference_attention(q, k, v, causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_unpadded_lengths(self):
        # lengths not multiples of the block sizes
        q, k, v = make_qkv(seed=3, L=57, lk=91)
        got = flash_attention(q, k, v)
        want = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_full_bias_per_batch_head(self):
        q, k, v = make_qkv(seed=4, L=16)
        rng = np.random.default_rng(5)
        bias = jnp.asarray(
            rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
        )
        got = flash_attention(q, k, v, bias=bias)
        want = reference_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_clip_encoder_path(self):
        from explicit_alignment_for_vqa_tasks_tpu.models.clip import (
            CLIPVisionConfig,
            clip_encode_image,
            init_clip_vision_params,
        )

        cfg = CLIPVisionConfig.small_test()
        params = init_clip_vision_params(jax.random.PRNGKey(0), cfg,
                                         jnp.float32)
        rng = np.random.default_rng(6)
        images = jnp.asarray(
            rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
        )
        want = clip_encode_image(params, cfg, images, use_pallas=False)
        got = clip_encode_image(params, cfg, images, use_pallas=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-5, atol=5e-5)
