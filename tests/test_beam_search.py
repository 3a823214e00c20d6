"""Beam search vs greedy and vs HF generate (tiny random T5)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
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
        _, greedy_scores = beam_search_t5(
            params, cfg, hidden, jnp.asarray(mask), num_beams=1,
            max_new_tokens=8,
        )
        _, beam_scores = beam_search_t5(
            params, cfg, hidden, jnp.asarray(mask), num_beams=4,
            max_new_tokens=8,
        )
        assert np.all(
            np.asarray(beam_scores) >= np.asarray(greedy_scores) - 1e-5
        )
