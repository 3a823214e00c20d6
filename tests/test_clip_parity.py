"""Numeric parity of our JAX CLIP towers vs HuggingFace torch (tiny models)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.clip import (  # noqa: E402
    CLIPTextConfig,
    CLIPVisionConfig,
    clip_encode_image,
    clip_encode_text,
)
from explicit_alignment_for_vqa_tasks_tpu.models.hf_convert import (  # noqa: E402
    clip_text_params_from_hf,
    clip_vision_params_from_hf,
)


class TestCLIPVisionParity:
    @pytest.fixture(scope="class")
    def pair(self):
        hf_cfg = transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
            projection_dim=16, hidden_act="quick_gelu",
            attention_dropout=0.0,
        )
        torch.manual_seed(0)
        hf_model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
        cfg = CLIPVisionConfig.small_test()
        params = jax.tree.map(
            jnp.asarray, clip_vision_params_from_hf(hf_model.state_dict(), cfg)
        )
        return hf_model, cfg, params

    def test_image_embeddings(self, pair):
        hf_model, cfg, params = pair
        rng = np.random.default_rng(0)
        images = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            want = hf_model(
                pixel_values=torch.tensor(images.transpose(0, 3, 1, 2))
            ).image_embeds.numpy()
        got = np.asarray(
            clip_encode_image(params, cfg, jnp.asarray(images))
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestCLIPTextParity:
    @pytest.fixture(scope="class")
    def pair(self):
        hf_cfg = transformers.CLIPTextConfig(
            vocab_size=96, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, projection_dim=16,
            hidden_act="quick_gelu", attention_dropout=0.0,
            eos_token_id=95, bos_token_id=94,
        )
        torch.manual_seed(0)
        hf_model = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
        cfg = CLIPTextConfig.small_test()
        params = jax.tree.map(
            jnp.asarray, clip_text_params_from_hf(hf_model.state_dict(), cfg)
        )
        return hf_model, cfg, params

    def test_text_embeddings(self, pair):
        hf_model, cfg, params = pair
        rng = np.random.default_rng(1)
        # tokens below eos; put eos (the max id) at a per-row position
        ids = rng.integers(1, 90, size=(2, 10)).astype(np.int64)
        ids[0, 6] = 95
        ids[1, 9] = 95
        with torch.no_grad():
            want = hf_model(input_ids=torch.tensor(ids)).text_embeds.numpy()
        got = np.asarray(
            clip_encode_text(params, cfg, jnp.asarray(ids.astype(np.int32)))
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
