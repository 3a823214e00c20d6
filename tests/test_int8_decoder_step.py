"""Weight-only int8 decode-step matmuls (cfg.int8_decoder_step).

Decode at query-length 1 is weight-streaming bound (PARITY.md decode
accounting), so the decoder's per-step matmul weights stream as int8
(half the bf16 bytes) with grouped per-(contraction-group, out-channel)
scales, while activations stay bf16 — W8A16, much gentler drift than the
encoder's W8A8 modes. These tests pin: quantization error bound, step
logit closeness, greedy/forced/beam agreement, the missing-quantization
guard, and composition with int8_cross_kv (the full-int8 decode).
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (  # noqa: E402
    T5Config,
    init_decode_cache,
    init_t5_params,
    quantize_decoder_step,
    t5_decode_step,
    t5_encode,
)
from explicit_alignment_for_vqa_tasks_tpu.ops.decoding import (  # noqa: E402
    beam_search_t5,
    forced_decode_t5,
    greedy_decode_t5,
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
    q8_params = quantize_decoder_step(params)
    rng = np.random.default_rng(7)
    B, L = 4, 12
    ids = jnp.asarray(rng.integers(2, 128, size=(B, L)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, L), np.int32))
    hidden = t5_encode(params, cfg, input_ids=ids, attention_mask=mask)
    q8_cfg = dataclasses.replace(cfg, int8_decoder_step=True)
    return cfg, params, q8_cfg, q8_params, hidden, mask


class TestQuantizeDecoderStep:
    def test_all_step_matmuls_quantized(self, setup):
        _, _, _, q8_params, _, _ = setup
        q8 = q8_params["decoder"]["step_q8"]
        expected = {"self_q", "self_k", "self_v", "self_o",
                    "cross_q", "cross_o", "wi_0", "wi_1", "wo"}
        assert {k for k in q8 if not k.endswith("_s")} == expected
        for name in expected:
            assert q8[name].dtype == jnp.int8
            assert q8[name + "_s"].dtype == jnp.float32
            # stacked over layers with per-(group, out-channel) scales
            layers, k_dim, f_dim = q8[name].shape
            assert q8[name + "_s"].shape[0] == layers
            assert q8[name + "_s"].shape[2] == f_dim

    def test_dequant_error_bound(self, setup):
        cfg, params, _, q8_params, _, _ = setup
        q8 = q8_params["decoder"]["step_q8"]
        w = np.asarray(params["decoder"]["ffn"]["wi_0"], np.float32)
        qw = np.asarray(q8["wi_0"], np.float32)
        sc = np.asarray(q8["wi_0_s"])  # (L, G, F)
        layers, k_dim, f_dim = w.shape
        g = sc.shape[1]
        deq = (qw.reshape(layers, g, k_dim // g, f_dim)
               * sc[:, :, None, :]).reshape(layers, k_dim, f_dim)
        err = np.abs(deq - w)
        bound = np.repeat(sc, k_dim // g, axis=1) * 0.5 + 1e-6
        assert np.all(err <= bound), err.max()

    def test_bf16_decoder_untouched(self, setup):
        cfg, params, _, q8_params, _, _ = setup
        for sub in ("self_attn", "cross_attn", "ffn"):
            for name, w in params["decoder"][sub].items():
                assert q8_params["decoder"][sub][name] is w


class TestInt8DecodeStep:
    def test_single_step_logits_close(self, setup):
        cfg, params, q8_cfg, q8_params, hidden, mask = setup
        fp_cache = init_decode_cache(params, cfg, hidden, 6)
        q8_cache = init_decode_cache(q8_params, q8_cfg, hidden, 6)
        token = jnp.zeros((hidden.shape[0],), dtype=jnp.int32)
        fp_logits, _ = t5_decode_step(params, cfg, token, fp_cache, mask)
        q8_logits, _ = t5_decode_step(q8_params, q8_cfg, token, q8_cache,
                                      mask)
        fp_logits = np.asarray(fp_logits)
        q8_logits = np.asarray(q8_logits)
        cos = (fp_logits * q8_logits).sum(-1) / (
            np.linalg.norm(fp_logits, axis=-1)
            * np.linalg.norm(q8_logits, axis=-1)
        )
        assert np.all(cos > 0.999), cos

    def test_greedy_decode_token_agreement(self, setup):
        cfg, params, q8_cfg, q8_params, hidden, mask = setup
        fp_tokens, fp_lps = greedy_decode_t5(params, cfg, hidden, mask, 8)
        q8_tokens, q8_lps = greedy_decode_t5(q8_params, q8_cfg, hidden,
                                             mask, 8)
        agree = float(
            (np.asarray(fp_tokens) == np.asarray(q8_tokens)).mean()
        )
        # random-init margins are tiny; trained weights agree strictly
        # more (cf. the bf16 drift study's margin argument)
        assert agree >= 0.9, agree
        same = np.asarray(fp_tokens) == np.asarray(q8_tokens)
        lp_diff = np.abs(np.asarray(fp_lps) - np.asarray(q8_lps))[same]
        assert lp_diff.max() < 0.05, lp_diff.max()

    def test_forced_decode_runs(self, setup):
        cfg, params, q8_cfg, q8_params, hidden, mask = setup
        B = hidden.shape[0]
        forced = jnp.asarray(
            np.full((B, 3), cfg.decoder_start_token_id, np.int32)
        )
        fp_tokens, _ = forced_decode_t5(params, cfg, hidden, mask, forced,
                                        6)
        q8_tokens, _ = forced_decode_t5(q8_params, q8_cfg, hidden, mask,
                                        forced, 6)
        agree = float(
            (np.asarray(fp_tokens) == np.asarray(q8_tokens)).mean()
        )
        assert agree >= 0.8, agree

    def test_beam_search_runs(self, setup):
        cfg, params, q8_cfg, q8_params, hidden, mask = setup
        tokens, _ = beam_search_t5(
            q8_params, q8_cfg, hidden, mask, num_beams=3, max_new_tokens=5
        )
        ref_tokens, _ = beam_search_t5(
            params, cfg, hidden, mask, num_beams=3, max_new_tokens=5
        )
        assert tokens.shape == ref_tokens.shape
        agree = float(
            (np.asarray(tokens) == np.asarray(ref_tokens)).mean()
        )
        assert agree >= 0.8, agree

    def test_composes_with_int8_cross_kv(self, setup):
        cfg, params, _, q8_params, hidden, mask = setup
        full_cfg = dataclasses.replace(cfg, int8_decoder_step=True,
                                       int8_cross_kv=True)
        tokens, _ = greedy_decode_t5(q8_params, full_cfg, hidden, mask, 8)
        ref_tokens, _ = greedy_decode_t5(params, cfg, hidden, mask, 8)
        agree = float(
            (np.asarray(tokens) == np.asarray(ref_tokens)).mean()
        )
        assert agree >= 0.85, agree

    def test_missing_quantization_guard(self, setup):
        cfg, params, q8_cfg, _, hidden, mask = setup
        cache = init_decode_cache(params, q8_cfg, hidden, 4)
        token = jnp.zeros((hidden.shape[0],), dtype=jnp.int32)
        with pytest.raises(ValueError, match="int8_decoder_step"):
            t5_decode_step(params, q8_cfg, token, cache, mask)


class TestDropBf16:
    """drop_bf16=True: the production eval deployment (model_factory) —
    the dead bf16 decoder copies are removed so the int8 weights are a
    capacity win, not a cost, at the B=64 decode point."""

    @pytest.fixture(scope="class")
    def dropped(self, setup):
        _, params, _, _, _, _ = setup
        return quantize_decoder_step(params, drop_bf16=True)

    def test_weights_removed_cache_inputs_kept(self, setup, dropped):
        assert set(dropped["decoder"]["self_attn"]) == set()
        # cross k/v build the decode cache from encoder hidden — kept
        assert set(dropped["decoder"]["cross_attn"]) == {"k", "v"}
        assert set(dropped["decoder"]["ffn"]) == set()
        assert "step_q8" in dropped["decoder"]

    def test_greedy_decode_matches_undropped(self, setup, dropped):
        cfg, _, q8_cfg, q8_params, hidden, mask = setup
        kept_tokens, kept_lps = greedy_decode_t5(
            q8_params, q8_cfg, hidden, mask, 8
        )
        drop_tokens, drop_lps = greedy_decode_t5(
            dropped, q8_cfg, hidden, mask, 8
        )
        np.testing.assert_array_equal(np.asarray(kept_tokens),
                                      np.asarray(drop_tokens))
        np.testing.assert_allclose(np.asarray(kept_lps),
                                   np.asarray(drop_lps), rtol=1e-5)

    def test_teacher_forced_raises_clearly(self, setup, dropped):
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            t5_decode,
        )

        cfg, _, q8_cfg, _, hidden, mask = setup
        B = hidden.shape[0]
        dec_ids = jnp.zeros((B, 3), dtype=jnp.int32)
        with pytest.raises(ValueError, match="eval-only"):
            t5_decode(dropped, q8_cfg, dec_ids, hidden, mask)
