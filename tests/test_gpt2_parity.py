"""Numeric parity of our JAX GPT-2 vs HuggingFace torch (tiny random model),
plus cache-consistency checks for incremental decoding."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.gpt2 import (  # noqa: E402
    GPT2Config,
    gpt2_decode_step,
    gpt2_embed,
    gpt2_forward,
    gpt2_prefill,
    init_gpt2_cache,
)
from explicit_alignment_for_vqa_tasks_tpu.models.hf_convert import (  # noqa: E402
    gpt2_params_from_hf,
)


@pytest.fixture(scope="module")
def tiny_pair():
    hf_cfg = transformers.GPT2Config(
        vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    cfg = GPT2Config.small_test()
    params = jax.tree.map(
        jnp.asarray, gpt2_params_from_hf(hf_model.state_dict(), cfg)
    )
    return hf_model, cfg, params


class TestGPT2Parity:
    def test_logits(self, tiny_pair):
        hf_model, cfg, params = tiny_pair
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 128, size=(2, 10)).astype(np.int32)
        with torch.no_grad():
            want = hf_model(torch.tensor(ids.astype(np.int64))).logits.numpy()
        got = np.asarray(gpt2_forward(params, cfg, input_ids=jnp.asarray(ids)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_inputs_embeds(self, tiny_pair):
        hf_model, cfg, params = tiny_pair
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 128, size=(1, 6)).astype(np.int64)
        # HF adds positional embeddings to inputs_embeds internally;
        # feed token embeddings only to HF, full embedding to ours
        with torch.no_grad():
            tok_emb = hf_model.transformer.wte(torch.tensor(ids))
            want = hf_model(inputs_embeds=tok_emb).logits.numpy()
        embeds = gpt2_embed(params, cfg, jnp.asarray(ids.astype(np.int32)))
        got = np.asarray(gpt2_forward(params, cfg, inputs_embeds=embeds))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_prefill_then_steps_matches_full(self, tiny_pair):
        _, cfg, params = tiny_pair
        rng = np.random.default_rng(2)
        ids = rng.integers(0, 128, size=(2, 8)).astype(np.int32)
        full = np.asarray(gpt2_forward(params, cfg, input_ids=jnp.asarray(ids)))

        prompt_len, max_len = 5, 8
        cache = init_gpt2_cache(cfg, batch=2, max_len=max_len)
        mask = np.ones((2, max_len), dtype=np.int32)
        embeds = gpt2_embed(params, cfg, jnp.asarray(ids[:, :prompt_len]))
        logits, cache = gpt2_prefill(
            params, cfg, embeds, jnp.asarray(mask[:, :prompt_len]), cache
        )
        np.testing.assert_allclose(
            np.asarray(logits), full[:, prompt_len - 1], rtol=2e-4, atol=2e-4
        )
        for t in range(prompt_len, 8):
            logits, cache = gpt2_decode_step(
                params, cfg, jnp.asarray(ids[:, t]), cache, jnp.asarray(mask)
            )
            np.testing.assert_allclose(
                np.asarray(logits), full[:, t], rtol=2e-4, atol=2e-4
            )
