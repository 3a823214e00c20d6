"""Weights-gated real-model validation (round-1 review item #9).

Zero-egress blocks downloading T0-3B / CLIP weights, so these tests
auto-skip unless env vars point at LOCAL HuggingFace checkpoints:

    EAVT_T0_WEIGHTS   — dir for a T5 v1.1-family seq2seq model
                        (bigscience/T0_3B, google/t5-*-lm-adapt, ...)
    EAVT_CLIP_WEIGHTS — dir for a CLIP model (openai/clip-vit-*)

When present: convert with models/hf_convert.py, assert logit parity vs
the HF torch forward on fixed prompts, and run a greedy-decode smoke.
The reference defines its behavior with these weights
(reference: src/models/vct0.py:313); this is the switch-over check a
user runs once their weights are mounted.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

T0_DIR = os.environ.get("EAVT_T0_WEIGHTS")
CLIP_DIR = os.environ.get("EAVT_CLIP_WEIGHTS")

PROMPTS = [
    "Combine facts and answer this: what color is the sky?",
    "A picture of",
    "Please answer the following question. What is the capital of France?",
]


@pytest.mark.skipif(not T0_DIR, reason="EAVT_T0_WEIGHTS not set")
class TestRealT0Weights:
    @pytest.fixture(scope="class")
    def converted(self):
        import torch
        import transformers

        from explicit_alignment_for_vqa_tasks_tpu.models.hf_convert import (
            t5_params_from_hf,
        )
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import T5Config

        hf = transformers.T5ForConditionalGeneration.from_pretrained(
            T0_DIR, local_files_only=True, torch_dtype=torch.float32
        )
        hf.eval()
        hf_cfg = hf.config
        cfg = T5Config(
            vocab_size=hf_cfg.vocab_size,
            d_model=hf_cfg.d_model,
            d_kv=hf_cfg.d_kv,
            num_heads=hf_cfg.num_heads,
            d_ff=hf_cfg.d_ff,
            num_encoder_layers=hf_cfg.num_layers,
            num_decoder_layers=hf_cfg.num_decoder_layers,
            relative_attention_num_buckets=(
                hf_cfg.relative_attention_num_buckets
            ),
            relative_attention_max_distance=(
                hf_cfg.relative_attention_max_distance
            ),
            tie_word_embeddings=hf_cfg.tie_word_embeddings,
            dtype=jnp.float32,
        )
        params = t5_params_from_hf(hf.state_dict(), cfg)
        tok = transformers.AutoTokenizer.from_pretrained(
            T0_DIR, local_files_only=True
        )
        return hf, cfg, params, tok

    def test_logit_parity_on_fixed_prompts(self, converted):
        import torch

        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            t5_decode,
            t5_encode,
        )

        hf, cfg, params, tok = converted
        enc = tok(PROMPTS, padding="longest", return_tensors="pt")
        dec_ids = torch.zeros((len(PROMPTS), 1), dtype=torch.long)
        with torch.no_grad():
            want = hf(
                input_ids=enc["input_ids"],
                attention_mask=enc["attention_mask"],
                decoder_input_ids=dec_ids,
            ).logits.float().numpy()

        ids = jnp.asarray(enc["input_ids"].numpy())
        mask = jnp.asarray(enc["attention_mask"].numpy())
        hidden = t5_encode(params, cfg, input_ids=ids, attention_mask=mask)
        got = np.asarray(t5_decode(
            params, cfg, jnp.zeros((len(PROMPTS), 1), jnp.int32),
            hidden, mask,
        ))
        # fp32-vs-fp32: argmax must agree everywhere; values close
        assert (got.argmax(-1) == want.argmax(-1)).all()
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_greedy_decode_smoke(self, converted):
        from explicit_alignment_for_vqa_tasks_tpu.ops.decoding import (
            greedy_decode_t5,
        )
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import t5_encode

        hf, cfg, params, tok = converted
        enc = tok(PROMPTS[:1], return_tensors="np")
        ids = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc["attention_mask"])
        hidden = t5_encode(params, cfg, input_ids=ids, attention_mask=mask)
        tokens, _ = greedy_decode_t5(params, cfg, hidden, mask, 10)
        text = tok.decode(np.asarray(tokens)[0], skip_special_tokens=True)
        assert isinstance(text, str) and len(text) > 0


@pytest.mark.skipif(not CLIP_DIR, reason="EAVT_CLIP_WEIGHTS not set")
class TestRealCLIPWeights:
    def test_image_embedding_parity(self):
        import torch
        import transformers

        from explicit_alignment_for_vqa_tasks_tpu.models.clip import (
            CLIPVisionConfig,
            clip_encode_image,
        )
        from explicit_alignment_for_vqa_tasks_tpu.models.hf_convert import (
            clip_vision_params_from_hf,
        )

        hf = transformers.CLIPModel.from_pretrained(
            CLIP_DIR, local_files_only=True
        )
        hf.eval()
        vc = hf.config.vision_config
        cfg = CLIPVisionConfig(
            image_size=vc.image_size, patch_size=vc.patch_size,
            width=vc.hidden_size, num_layers=vc.num_hidden_layers,
            num_heads=vc.num_attention_heads,
            projection_dim=hf.config.projection_dim, dtype=jnp.float32,
        )
        params = clip_vision_params_from_hf(hf.state_dict(), cfg)
        rng = np.random.default_rng(0)
        imgs = rng.standard_normal(
            (2, cfg.image_size, cfg.image_size, 3)
        ).astype(np.float32)
        with torch.no_grad():
            want = hf.get_image_features(
                pixel_values=torch.from_numpy(
                    imgs.transpose(0, 3, 1, 2)
                )
            ).numpy()
        got = np.asarray(clip_encode_image(params, cfg, jnp.asarray(imgs)))
        cos = (got * want).sum(-1) / (
            np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
        )
        assert (cos > 0.999).all()
