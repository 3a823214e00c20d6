"""Fused Pallas decode cross-attention: parity with the XLA decode path
(interpret mode on CPU)."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (  # noqa: E402
    T5Config,
    init_t5_params,
    t5_encode,
)
from explicit_alignment_for_vqa_tasks_tpu.ops.decoding import (  # noqa: E402
    greedy_decode_t5,
)


def make_cfg(**kw):
    base = dict(
        vocab_size=256, d_model=64, d_kv=16, num_heads=4, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=3,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dtype=jnp.float32,
    )
    base.update(kw)
    return T5Config(**base)


class TestFusedDecodeAttention:
    def test_kernel_matches_xla_attention(self):
        from explicit_alignment_for_vqa_tasks_tpu.ops.decode_attention \
            import cross_attention_decode

        rng = np.random.default_rng(0)
        layers, batch, lenc, heads, dh = 3, 2, 11, 4, 16
        d = heads * dh
        q = jnp.asarray(rng.standard_normal((batch, d)).astype(np.float32))
        k = jnp.asarray(
            rng.standard_normal((layers, batch, lenc, d)).astype(np.float32)
        )
        v = jnp.asarray(
            rng.standard_normal((layers, batch, lenc, d)).astype(np.float32)
        )
        mask = np.ones((batch, lenc), dtype=np.int32)
        mask[0, -3:] = 0
        mask_j = jnp.asarray(mask)
        for layer in range(layers):
            got = np.asarray(cross_attention_decode(
                q, k, v, mask_j, jnp.int32(layer), heads
            ))
            # reference: per-head softmax(q k^T + keymask) v (unscaled)
            qh = np.asarray(q).reshape(batch, heads, dh)
            kh = np.asarray(k[layer]).reshape(batch, lenc, heads, dh)
            vh = np.asarray(v[layer]).reshape(batch, lenc, heads, dh)
            s = np.einsum("bhd,blhd->bhl", qh, kh)
            s = s + np.where(mask[:, None, :] > 0, 0.0, -1e9)
            p = np.exp(s - s.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            want = np.einsum("bhl,blhd->bhd", p, vh).reshape(batch, d)
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize("pad", [0, 4])
    def test_greedy_decode_parity(self, pad):
        cfg = make_cfg()
        fused = dataclasses.replace(cfg, fused_decode_attention=True)
        params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(2, 250, (3, 9)).astype(np.int32))
        mask = np.ones((3, 9), dtype=np.int32)
        if pad:
            mask[1, -pad:] = 0
        mask_j = jnp.asarray(mask)
        hidden = t5_encode(params, cfg, input_ids=ids, attention_mask=mask_j)
        want_toks, want_lp = greedy_decode_t5(params, cfg, hidden, mask_j, 6)
        got_toks, got_lp = greedy_decode_t5(params, fused, hidden, mask_j, 6)
        np.testing.assert_array_equal(np.asarray(got_toks),
                                      np.asarray(want_toks))
        np.testing.assert_allclose(np.asarray(got_lp), np.asarray(want_lp),
                                   rtol=1e-4, atol=1e-5)
