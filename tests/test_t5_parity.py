"""Numeric parity of our JAX T5 vs HuggingFace torch T5 (tiny random model).

Catching layernorm/bias/bucketing drift here is what makes VQA-score parity
with the reference trustworthy (SURVEY §7 hard part #2).
"""

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
    cross_entropy_loss,
    init_decode_cache,
    shift_right,
    t5_decode,
    t5_decode_step,
    t5_encode,
    t5_forward_loss,
)


@pytest.fixture(scope="module")
def tiny_pair():
    hf_cfg = transformers.T5Config(
        vocab_size=256,
        d_model=32,
        d_kv=8,
        num_heads=4,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
        dropout_rate=0.0,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    hf_model = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    cfg = T5Config(
        vocab_size=256, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_encoder_layers=2, num_decoder_layers=2,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        dtype=jnp.float32,
    )
    params = t5_params_from_hf(hf_model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)
    return hf_model, cfg, params


def random_batch(seed=0, B=2, L=12, T=5, V=256):
    rng = np.random.default_rng(seed)
    input_ids = rng.integers(2, V, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), dtype=np.int32)
    mask[0, -3:] = 0
    dec_ids = rng.integers(2, V, size=(B, T)).astype(np.int32)
    dec_ids[:, 0] = 0  # decoder start
    return input_ids, mask, dec_ids


class TestT5Parity:
    def test_encoder_hidden_states(self, tiny_pair):
        hf_model, cfg, params = tiny_pair
        input_ids, mask, _ = random_batch()
        with torch.no_grad():
            want = hf_model.encoder(
                input_ids=torch.tensor(input_ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            ).last_hidden_state.numpy()
        got = np.asarray(t5_encode(
            params, cfg, input_ids=jnp.asarray(input_ids),
            attention_mask=jnp.asarray(mask),
        ))
        # padding positions may differ; compare only valid positions
        np.testing.assert_allclose(
            got[mask.astype(bool)], want[mask.astype(bool)],
            rtol=2e-4, atol=2e-5,
        )

    def test_lm_logits(self, tiny_pair):
        hf_model, cfg, params = tiny_pair
        input_ids, mask, dec_ids = random_batch()
        with torch.no_grad():
            want = hf_model(
                input_ids=torch.tensor(input_ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
                decoder_input_ids=torch.tensor(dec_ids.astype(np.int64)),
            ).logits.numpy()
        hidden = t5_encode(
            params, cfg, input_ids=jnp.asarray(input_ids),
            attention_mask=jnp.asarray(mask),
        )
        got = np.asarray(t5_decode(
            params, cfg, jnp.asarray(dec_ids), hidden, jnp.asarray(mask)
        ))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_inputs_embeds_entry(self, tiny_pair):
        hf_model, cfg, params = tiny_pair
        rng = np.random.default_rng(1)
        embeds = rng.standard_normal((2, 7, 32)).astype(np.float32)
        mask = np.ones((2, 7), dtype=np.int32)
        dec_ids = np.zeros((2, 3), dtype=np.int32)
        with torch.no_grad():
            want = hf_model(
                inputs_embeds=torch.tensor(embeds),
                attention_mask=torch.tensor(mask.astype(np.int64)),
                decoder_input_ids=torch.tensor(dec_ids.astype(np.int64)),
            ).logits.numpy()
        hidden = t5_encode(
            params, cfg, inputs_embeds=jnp.asarray(embeds),
            attention_mask=jnp.asarray(mask),
        )
        got = np.asarray(t5_decode(
            params, cfg, jnp.asarray(dec_ids), hidden, jnp.asarray(mask)
        ))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_incremental_matches_teacher_forced(self, tiny_pair):
        _, cfg, params = tiny_pair
        input_ids, mask, dec_ids = random_batch(seed=3, T=6)
        hidden = t5_encode(
            params, cfg, input_ids=jnp.asarray(input_ids),
            attention_mask=jnp.asarray(mask),
        )
        full = np.asarray(t5_decode(
            params, cfg, jnp.asarray(dec_ids), hidden, jnp.asarray(mask)
        ))
        cache = init_decode_cache(params, cfg, hidden, max_len=6)
        step_logits = []
        for t in range(dec_ids.shape[1]):
            logits, cache = t5_decode_step(
                params, cfg, jnp.asarray(dec_ids[:, t]), cache,
                jnp.asarray(mask),
            )
            step_logits.append(np.asarray(logits))
        got = np.stack(step_logits, axis=1)
        np.testing.assert_allclose(got, full, rtol=2e-4, atol=2e-4)

    def test_loss_matches_hf(self, tiny_pair):
        hf_model, cfg, params = tiny_pair
        input_ids, mask, _ = random_batch(seed=5)
        rng = np.random.default_rng(6)
        labels = rng.integers(2, 256, size=(2, 5)).astype(np.int64)
        labels[0, -2:] = -100
        with torch.no_grad():
            want = hf_model(
                input_ids=torch.tensor(input_ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
                labels=torch.tensor(labels),
            ).loss.item()
        got = float(t5_forward_loss(
            params, cfg, jnp.asarray(labels),
            input_ids=jnp.asarray(input_ids),
            attention_mask=jnp.asarray(mask),
        ))
        assert abs(got - want) < 1e-4

    def test_shift_right(self):
        cfg = T5Config.small_test()
        labels = jnp.asarray([[5, 6, -100]])
        np.testing.assert_array_equal(
            np.asarray(shift_right(labels, cfg)), [[0, 5, 6]]
        )

    def test_cross_entropy_ignores_masked(self):
        logits = jnp.zeros((1, 3, 4))
        labels = jnp.asarray([[1, 2, -100]])
        loss, n = cross_entropy_loss(logits, labels)
        assert int(n) == 2
        np.testing.assert_allclose(float(loss), np.log(4), rtol=1e-6)
