"""Beam search vs greedy and vs HF generate (tiny random T5)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.hf_convert import (  # noqa: E402
    t5_params_from_hf,
)
from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (  # noqa: E402
    T5Config,
    t5_encode,
)
from explicit_alignment_for_vqa_tasks_tpu.ops.decoding import (  # noqa: E402
    beam_search_t5,
    greedy_decode_t5,
)


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.T5Config(
        vocab_size=64, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, dropout_rate=0.0,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(7)
    hf_model = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    cfg = T5Config(
        vocab_size=64, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_encoder_layers=2, num_decoder_layers=2,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        dtype=jnp.float32,
    )
    params = jax.tree.map(
        jnp.asarray, t5_params_from_hf(hf_model.state_dict(), cfg)
    )
    return hf_model, cfg, params


class TestBeamSearch:
    def test_beam1_equals_greedy(self, pair):
        _, cfg, params = pair
        rng = np.random.default_rng(0)
        ids = rng.integers(2, 64, size=(3, 8)).astype(np.int32)
        mask = np.ones((3, 8), dtype=np.int32)
        hidden = t5_encode(params, cfg, input_ids=jnp.asarray(ids),
                           attention_mask=jnp.asarray(mask))
        greedy, _ = greedy_decode_t5(params, cfg, hidden, jnp.asarray(mask),
                                     max_new_tokens=6)
        beam, _ = beam_search_t5(params, cfg, hidden, jnp.asarray(mask),
                                 num_beams=1, max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(beam), np.asarray(greedy))

    def test_matches_hf_beam_search(self, pair):
        hf_model, cfg, params = pair
        rng = np.random.default_rng(1)
        ids = rng.integers(2, 64, size=(4, 8)).astype(np.int64)
        mask = np.ones((4, 8), dtype=np.int64)
        T = 6
        with torch.no_grad():
            want = hf_model.generate(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
                max_length=T + 1, num_beams=3, do_sample=False,
                length_penalty=1.0, early_stopping=False,
            ).numpy()[:, 1:]
        hidden = t5_encode(
            params, cfg, input_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.asarray(mask.astype(np.int32)),
        )
        got, _ = beam_search_t5(
            params, cfg, hidden, jnp.asarray(mask.astype(np.int32)),
            num_beams=3, max_new_tokens=T,
        )
        got = np.asarray(got)
        # pad-extend HF output to T columns if it stopped early
        if want.shape[1] < T:
            want = np.pad(want, ((0, 0), (0, T - want.shape[1])))
        np.testing.assert_array_equal(got, want)

    def test_beam_scores_not_worse_than_greedy(self, pair):
        _, cfg, params = pair
        rng = np.random.default_rng(2)
        ids = rng.integers(2, 64, size=(4, 10)).astype(np.int32)
        mask = np.ones((4, 10), dtype=np.int32)
        hidden = t5_encode(params, cfg, input_ids=jnp.asarray(ids),
                           attention_mask=jnp.asarray(mask))
        def norm_score(tokens, lps):
            tokens, lps = np.asarray(tokens), np.asarray(lps)
            gen_len = np.maximum((tokens != cfg.pad_token_id).sum(1), 1)
            return lps.sum(1) / gen_len

        g_tokens, g_lps = beam_search_t5(
            params, cfg, hidden, jnp.asarray(mask), num_beams=1,
            max_new_tokens=8,
        )
        b_tokens, b_lps = beam_search_t5(
            params, cfg, hidden, jnp.asarray(mask), num_beams=4,
            max_new_tokens=8,
        )
        assert np.all(
            norm_score(b_tokens, b_lps) >= norm_score(g_tokens, g_lps) - 1e-5
        )

    def test_token_logprobs_match_rescoring(self, pair):
        """Beam per-token logprobs must be the REAL chosen-token logps:
        teacher-force the winning hypothesis through the decoder and
        compare position by position (guards the beam x ensemble
        composition, VERDICT r2 weak #5)."""
        hf_model, cfg, params = pair
        rng = np.random.default_rng(3)
        B, T = 4, 8
        ids = rng.integers(2, 64, size=(B, 10)).astype(np.int32)
        mask = np.ones((B, 10), dtype=np.int32)
        hidden = t5_encode(params, cfg, input_ids=jnp.asarray(ids),
                           attention_mask=jnp.asarray(mask))
        tokens, lps = beam_search_t5(
            params, cfg, hidden, jnp.asarray(mask), num_beams=3,
            max_new_tokens=T,
        )
        tokens, lps = np.asarray(tokens), np.asarray(lps)
        # teacher-force through HF: logp of token t given tokens < t
        dec_in = np.concatenate(
            [np.zeros((B, 1), np.int64), tokens[:, :-1].astype(np.int64)],
            axis=1,
        )
        with torch.no_grad():
            out = hf_model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
                decoder_input_ids=torch.tensor(dec_in),
            )
        ref_logp = torch.log_softmax(out.logits, dim=-1).numpy()
        want = np.take_along_axis(
            ref_logp, tokens[:, :, None].astype(np.int64), axis=2
        )[:, :, 0]
        # positions after finish emit pad with logprob 0 by convention
        finished = np.zeros(B, dtype=bool)
        for t in range(T):
            for b in range(B):
                if finished[b]:
                    want[b, t] = 0.0
            finished |= tokens[:, t] == 1
        np.testing.assert_allclose(lps, want, atol=1e-4)

    def test_hf_parity_larger_model_unequal_finishes(self):
        """HF beam parity at a larger model scale with rows finishing at
        different lengths (tokens AND normalized sequence scores)."""
        hf_cfg = transformers.T5Config(
            vocab_size=256, d_model=64, d_kv=16, num_heads=4, d_ff=128,
            num_layers=3, num_decoder_layers=3,
            feed_forward_proj="gated-gelu", tie_word_embeddings=False,
            dropout_rate=0.0, relative_attention_num_buckets=8,
            relative_attention_max_distance=16, decoder_start_token_id=0,
            pad_token_id=0, eos_token_id=1,
        )
        torch.manual_seed(11)
        hf_model = transformers.T5ForConditionalGeneration(hf_cfg).eval()
        with torch.no_grad():
            # boost the EOS logit row so some (not all) rows finish early,
            # producing unequal hypothesis lengths
            hf_model.lm_head.weight[1] *= 40.0
        cfg = T5Config(
            vocab_size=256, d_model=64, d_kv=16, num_heads=4, d_ff=128,
            num_encoder_layers=3, num_decoder_layers=3,
            relative_attention_num_buckets=8,
            relative_attention_max_distance=16, dtype=jnp.float32,
        )
        params = jax.tree.map(
            jnp.asarray, t5_params_from_hf(hf_model.state_dict(), cfg)
        )
        rng = np.random.default_rng(12)
        B, T = 6, 12
        ids = rng.integers(2, 256, size=(B, 9)).astype(np.int64)
        mask = np.ones((B, 9), dtype=np.int64)
        with torch.no_grad():
            out = hf_model.generate(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
                max_length=T + 1, num_beams=4, do_sample=False,
                length_penalty=1.0, early_stopping=False,
                return_dict_in_generate=True, output_scores=True,
                pad_token_id=0,
            )
        want = out.sequences.numpy()[:, 1:]
        hidden = t5_encode(
            params, cfg, input_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.asarray(mask.astype(np.int32)),
        )
        got, lps = beam_search_t5(
            params, cfg, hidden, jnp.asarray(mask.astype(np.int32)),
            num_beams=4, max_new_tokens=T,
        )
        got, lps = np.asarray(got), np.asarray(lps)
        if want.shape[1] < T:
            want = np.pad(want, ((0, 0), (0, T - want.shape[1])))

        def canonical(a):
            """Zero out positions after the first EOS (HF pads finished
            hypotheses with EOS in this version; we emit pad=0)."""
            a = a.copy()
            for row in a:
                hits = np.flatnonzero(row == 1)
                if hits.size:
                    row[hits[0] + 1:] = 0
            return a

        np.testing.assert_array_equal(canonical(got), canonical(want))
        finish_lens = (canonical(want) != 0).sum(axis=1)
        assert len(set(finish_lens.tolist())) > 1, \
            "fixture should produce unequal finish lengths"
        # normalized sequence score parity vs HF sequences_scores
        norm = lps.sum(1) / np.maximum((canonical(got) != 0).sum(1), 1)
        np.testing.assert_allclose(
            norm, out.sequences_scores.numpy(), atol=1e-4
        )
