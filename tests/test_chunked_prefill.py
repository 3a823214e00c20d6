"""Chunked prefill: encode + cross-KV cache build in batch chunks, decode
at the full batch (the recorded "next capacity lever" for the decode
batch-capacity wall, PARITY "Decode batch-capacity curve"). Value-equal
to the unchunked path — the encoder and the per-row cross-KV quantization
are row-independent — pinned here for bf16/fp32 AND every int8 layout.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (  # noqa: E402
    T5Config,
    cross_kv_cache,
    embed_tokens,
    init_t5_params,
    t5_encode,
)
from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (  # noqa: E402
    MapperConfig,
    VCT0Config,
    VCT0Model,
    init_vct0_params,
)
from explicit_alignment_for_vqa_tasks_tpu.ops.decoding import (  # noqa: E402
    chunked_prefill_greedy_decode_t5,
    encode_and_greedy_decode_t5,
)


@pytest.fixture(scope="module")
def setup():
    cfg = T5Config(
        vocab_size=128, d_model=64, d_kv=8, num_heads=8, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=3,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dtype=jnp.float32,
    )
    params = init_t5_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    rng = np.random.default_rng(7)
    B, L = 4, 12
    ids = jnp.asarray(rng.integers(2, 128, size=(B, L)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, L), np.int32))
    embeds = embed_tokens(params, cfg, ids)
    return cfg, params, embeds, mask


def _assert_decode_equal(cfg, params, embeds, mask, chunks):
    ref_tok, ref_lp = encode_and_greedy_decode_t5(
        params, cfg, embeds, mask, max_new_tokens=5
    )
    tok, lp = chunked_prefill_greedy_decode_t5(
        params, cfg, embeds, mask, max_new_tokens=5,
        prefill_chunks=chunks,
    )
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(ref_lp), rtol=0, atol=1e-6
    )


class TestChunkedPrefill:
    def test_fp32_equal(self, setup):
        cfg, params, embeds, mask = setup
        _assert_decode_equal(cfg, params, embeds, mask, chunks=2)
        _assert_decode_equal(cfg, params, embeds, mask, chunks=4)

    @pytest.mark.parametrize("layout",
                             ["unmerged", "merged", "transposed"])
    def test_int8_layouts_equal(self, setup, layout):
        cfg, params, embeds, mask = setup
        q8 = dataclasses.replace(cfg, int8_cross_kv=True,
                                 int8_kv_layout=layout)
        _assert_decode_equal(q8, params, embeds, mask, chunks=2)

    def test_layout_resolved_from_full_batch(self, setup):
        """With int8_kv_layout=None (auto), the chunk-built cache must
        use the layout the FULL decode batch resolves to (transposed at
        B>=96), not the chunk batch's — otherwise t5_decode_step reads
        the wrong layout at decode time."""
        cfg, params, embeds, mask = setup
        q8 = dataclasses.replace(cfg, int8_cross_kv=True)  # auto layout
        hidden = t5_encode(
            params, q8, inputs_embeds=embeds[:2], attention_mask=mask[:2]
        )
        auto_small = cross_kv_cache(params, q8, hidden)
        # chunk batch 2 alone resolves unmerged: (nl, b, L, H, kv)
        assert auto_small["cross_k"].shape == (3, 2, 12, 8, 8)
        forced = cross_kv_cache(params, q8, hidden, layout_batch=96)
        # full batch 96 resolves transposed: (nl, b, H, kv, L)
        assert forced["cross_k"].shape == (3, 2, 8, 8, 12)

    def test_non_divisible_batch_raises(self, setup):
        cfg, params, embeds, mask = setup
        with pytest.raises(ValueError, match="must divide batch"):
            chunked_prefill_greedy_decode_t5(
                params, cfg, embeds, mask, max_new_tokens=5,
                prefill_chunks=3,
            )

    def test_vct0_generate_prefill_chunks(self):
        """End to end through VCT0Model.generate (the bench surface):
        prefill_chunks=2 token- and logprob-equal to the default, and
        rejected off the main greedy path."""
        S = 32099
        cfg = VCT0Config(
            lm=T5Config.small_test(),
            mapper=MapperConfig(
                mapping_type="mlp", prefix_size=16, d_model=32,
                prefix_length=3, clip_length=3,
            ),
        )
        params = init_vct0_params(
            jax.random.PRNGKey(0), cfg, param_dtype=jnp.float32
        )
        model = VCT0Model(cfg, params)
        rng = np.random.default_rng(1)
        tokens = np.tile(
            np.array([[S, 11, 12, S - 1, 13, 1, 0, 0]], np.int32), (4, 1)
        )
        tokens[:, 1] = [11, 17, 23, 29]  # distinct rows
        mask = (tokens != 0).astype(np.int32)
        prefix = jnp.asarray(
            rng.standard_normal((4, 2, 16)).astype(np.float32)
        )
        ref_tok, ref_lp = model.generate(
            prefix=prefix, question_tokens=jnp.asarray(tokens),
            question_mask=jnp.asarray(mask), max_new_tokens=4,
        )
        tok, lp = model.generate(
            prefix=prefix, question_tokens=jnp.asarray(tokens),
            question_mask=jnp.asarray(mask), max_new_tokens=4,
            prefill_chunks=2,
        )
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(ref_lp), rtol=0, atol=1e-6
        )
        with pytest.raises(ValueError, match="prefill_chunks"):
            model.generate(
                prefix=prefix, question_tokens=jnp.asarray(tokens),
                question_mask=jnp.asarray(mask), max_new_tokens=4,
                prefill_chunks=2, num_beams=2,
            )
