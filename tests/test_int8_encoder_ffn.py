"""int8 encoder FFN (cfg.int8_encoder_ffn) — the opt-in bulk-eval
throughput mode for the frozen LM (round 3).

Pins (1) kernel-level parity of fused_t5_ffn_q8 against the fp32 FFN
math given int8-quantized weights, (2) model-level drift bounds of the
int8 encoder vs the exact path at depth, (3) the missing-ffn_q8 guard,
and (4) that quantize_encoder_ffn leaves the original params untouched.

Reference surface: the frozen T0-3B encoder inside eval generate
(/root/reference/src/models/vct0.py:396-491). int8 drift is NOT bf16
parity — the mode is opt-in and documented as such in T5Config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers

from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
    T5Config,
    init_t5_params,
    quantize_encoder_ffn,
    t5_encode,
)
from explicit_alignment_for_vqa_tasks_tpu.ops.fused_attention_block import (
    fused_t5_ffn_q8,
    quantize_weight_i8,
)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


class TestKernel:
    @pytest.mark.parametrize("gated", [True, False])
    def test_matches_fp32_ffn_with_quantized_weights(self, gated):
        d, f, b, l, eps = 64, 128, 2, 16, 1e-6
        ks = iter(jax.random.split(jax.random.PRNGKey(0), 8))
        x = jax.random.normal(next(ks), (b, l, d), dtype=jnp.float32)
        lnw = 1.0 + 0.1 * jax.random.normal(next(ks), (d,))
        wi_0 = jax.random.normal(next(ks), (d, f)) * d ** -0.5
        wi_1 = jax.random.normal(next(ks), (d, f)) * d ** -0.5
        wo = jax.random.normal(next(ks), (f, d)) * f ** -0.5

        q0, s0 = quantize_weight_i8(wi_0)
        q1, s1 = quantize_weight_i8(wi_1)
        qo, so = quantize_weight_i8(wo)
        out = fused_t5_ffn_q8(
            x, lnw, jnp.asarray(q0), jnp.asarray(s0),
            jnp.asarray(q1) if gated else None,
            jnp.asarray(s1) if gated else None,
            jnp.asarray(qo), jnp.asarray(so), eps=eps,
        )

        # fp32 reference of the same math on the DEQUANTIZED weights:
        # the remaining error is then only the per-row activation quant
        def ref(x, w0, w1, wo):
            var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
            h = x * jax.lax.rsqrt(var + eps) * lnw
            hid = h @ w0
            hid = (0.5 * hid * (1.0 + jnp.tanh(
                np.sqrt(2.0 / np.pi) * (hid + 0.044715 * hid ** 3))))
            if w1 is not None:
                hid = hid * (h @ w1)
            return x + hid @ wo

        deq = ref(
            x,
            jnp.asarray(q0, jnp.float32) * s0,
            (jnp.asarray(q1, jnp.float32) * s1) if gated else None,
            jnp.asarray(qo, jnp.float32) * so,
        )
        rel = float(jnp.max(jnp.abs(out - deq))
                    / (jnp.max(jnp.abs(deq)) + 1e-9))
        assert rel < 0.05, rel          # activation-quant error only
        assert _cos(out, deq) > 0.999

        exact = ref(x, wi_0, wi_1 if gated else None, wo)
        assert _cos(out, exact) > 0.995  # + weight-quant error

    def test_group_batching(self):
        d, f = 32, 64
        ks = iter(jax.random.split(jax.random.PRNGKey(1), 8))
        x = jax.random.normal(next(ks), (4, 8, d), dtype=jnp.float32)
        lnw = jnp.ones((d,))
        q0, s0 = quantize_weight_i8(jax.random.normal(next(ks), (d, f)))
        qo, so = quantize_weight_i8(jax.random.normal(next(ks), (f, d)))
        a = fused_t5_ffn_q8(x, lnw, jnp.asarray(q0), jnp.asarray(s0),
                            None, None, jnp.asarray(qo), jnp.asarray(so),
                            group=1)
        b2 = fused_t5_ffn_q8(x, lnw, jnp.asarray(q0), jnp.asarray(s0),
                             None, None, jnp.asarray(qo), jnp.asarray(so),
                             group=2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-5, atol=1e-5)

    def test_grouped_scales_match_dequantized_math(self):
        """(G, F) contraction-group scales: kernel parity against the
        fp32 math on the per-group-dequantized weights."""
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            _quant_stacked_i8,
        )

        d, f, b, l, eps, g = 64, 128, 2, 16, 1e-6, 4
        ks = iter(jax.random.split(jax.random.PRNGKey(7), 8))
        x = jax.random.normal(next(ks), (b, l, d), dtype=jnp.float32)
        lnw = 1.0 + 0.1 * jax.random.normal(next(ks), (d,))
        wi_0 = np.asarray(jax.random.normal(next(ks), (d, f))) * d ** -0.5
        wo = np.asarray(jax.random.normal(next(ks), (f, d))) * f ** -0.5
        q0, s0 = _quant_stacked_i8(wi_0[None], g)
        qo, so = _quant_stacked_i8(wo[None], g)
        out = fused_t5_ffn_q8(
            x, lnw, jnp.asarray(q0[0]), jnp.asarray(s0[0]), None, None,
            jnp.asarray(qo[0]), jnp.asarray(so[0]), eps=eps,
        )

        def deq(q, s):  # (K, F) int8 + (G, F) -> fp32
            k = q.shape[0]
            kg = k // s.shape[0]
            return (q.reshape(s.shape[0], kg, q.shape[1]).astype(np.float32)
                    * s[:, None, :]).reshape(k, q.shape[1])

        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        h = x * jax.lax.rsqrt(var + eps) * lnw
        hid = h @ deq(q0[0], s0[0])
        hid = 0.5 * hid * (1.0 + jnp.tanh(
            np.sqrt(2.0 / np.pi) * (hid + 0.044715 * hid ** 3)))
        want = x + hid @ deq(qo[0], so[0])
        assert _cos(out, want) > 0.999

    def test_grouped_quant_tames_outlier_channels(self):
        """One huge input channel poisons a whole-row activation scale;
        contraction groups confine it. Grouped weight+activation quant
        must recover most of the error on an outlier-heavy input."""
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            _quant_stacked_i8,
        )

        d, f, b, l, eps = 64, 128, 2, 16, 1e-6
        ks = iter(jax.random.split(jax.random.PRNGKey(9), 8))
        x = jax.random.normal(next(ks), (b, l, d), dtype=jnp.float32)
        lnw = jnp.ones((d,)).at[3].set(60.0)  # outlier channel via norm
        wi_0 = np.asarray(jax.random.normal(next(ks), (d, f))) * d ** -0.5
        wo = np.asarray(jax.random.normal(next(ks), (f, d))) * f ** -0.5

        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        h = x * jax.lax.rsqrt(var + eps) * lnw
        hid = h @ wi_0
        hid = 0.5 * hid * (1.0 + jnp.tanh(
            np.sqrt(2.0 / np.pi) * (hid + 0.044715 * hid ** 3)))
        exact = x + hid @ wo

        errs = {}
        for g in (1, 8):
            q0, s0 = _quant_stacked_i8(wi_0[None], g)
            qo, so = _quant_stacked_i8(wo[None], 1)
            out = fused_t5_ffn_q8(
                x, lnw, jnp.asarray(q0[0]), jnp.asarray(s0[0]), None, None,
                jnp.asarray(qo[0]), jnp.asarray(so[0]), eps=eps,
            )
            errs[g] = float(jnp.linalg.norm(out - exact)
                            / jnp.linalg.norm(exact))
        assert errs[8] < 0.6 * errs[1], errs


class TestGroupsAndSmoothQuant:
    def test_pick_groups(self):
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            _pick_groups,
        )

        assert _pick_groups(2048, "auto") == 8    # T0-3B d_model
        assert _pick_groups(5120, "auto") == 8    # T0-3B d_ff
        assert _pick_groups(2816, "auto") == 2    # t5-large d_ff (22*128)
        assert _pick_groups(64, "auto") == 1      # unaligned -> 1 group
        assert _pick_groups(64, 4) == 4           # explicit bypasses align
        with pytest.raises(ValueError):
            _pick_groups(64, 5)

    def _cfg(self, **kw):
        return T5Config.small_test(
            d_model=64, d_ff=128, num_heads=4, d_kv=16,
            num_encoder_layers=3, num_decoder_layers=2,
            fused_encoder_attention=True, **kw
        )

    def test_grouped_model_parity(self):
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            quantize_encoder_attn,
        )

        cfg = self._cfg()
        params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, 2000)
        mask = (ids % 7 != 0).astype(jnp.int32)
        ref = t5_encode(params, cfg, input_ids=ids, attention_mask=mask)
        pq = quantize_encoder_attn(
            quantize_encoder_ffn(params, groups=4), groups=4)
        out = t5_encode(
            pq, self._cfg(int8_encoder_ffn=True, int8_encoder_attn=True),
            input_ids=ids, attention_mask=mask,
        )
        assert _cos(out, ref) > 0.995
        assert pq["encoder"]["ffn_q8"]["wi_0_s"].shape[1] == 4
        assert pq["encoder"]["self_attn_q8"]["q_s"].shape[1] == 4

    def test_calibration_shapes_and_mask(self):
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            calibrate_encoder_act_max,
        )

        cfg = self._cfg()
        params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 2000)
        mask = jnp.ones((2, 16), jnp.int32).at[:, 8:].set(0)
        stats = calibrate_encoder_act_max(params, cfg, [(ids, mask)])
        assert stats["attn"].shape == (3, 64)
        assert stats["ffn"].shape == (3, 64)
        assert (stats["attn"] > 0).all() and (stats["ffn"] > 0).all()

        # masked (padded) positions must not contribute: giving them a
        # huge embedding must not move the recorded activation maxima
        embeds = np.asarray(
            jax.random.normal(jax.random.PRNGKey(2), (2, 16, 64)),
            np.float32)
        base = calibrate_encoder_act_max(
            params, cfg, [(jnp.asarray(embeds), mask)])
        spiked = embeds.copy()
        spiked[:, 8:, :] *= 1e3   # only padded positions
        got = calibrate_encoder_act_max(
            params, cfg, [(jnp.asarray(spiked), mask)])
        np.testing.assert_allclose(got["attn"], base["attn"], rtol=1e-5)
        np.testing.assert_allclose(got["ffn"], base["ffn"], rtol=1e-5)

        # multi-batch = elementwise running max
        ids2 = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 2000)
        both = calibrate_encoder_act_max(
            params, cfg, [(ids, mask), (ids2, None)])
        solo2 = calibrate_encoder_act_max(params, cfg, [(ids2, None)])
        np.testing.assert_allclose(
            both["ffn"], np.maximum(stats["ffn"], solo2["ffn"]), rtol=1e-5)

    def test_smoothquant_reduces_outlier_drift(self):
        """With an outlier channel in the norm scale (the structure real
        trained transformers show), SmoothQuant folding must beat plain
        per-channel quantization — and stay exact for the bf16 math."""
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            calibrate_encoder_act_max,
        )

        cfg = self._cfg()
        params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        # outlier channels via the FFN norm scales (per layer)
        ln1 = np.asarray(params["encoder"]["ln1"], np.float32).copy()
        ln1[:, 5] *= 40.0
        ln1[:, 17] *= 25.0
        params["encoder"]["ln1"] = jnp.asarray(ln1)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, 2000)
        ref = t5_encode(params, cfg, input_ids=ids)

        stats = calibrate_encoder_act_max(params, cfg, [(ids, None)])
        cfg_q = self._cfg(int8_encoder_ffn=True)

        def drift(pq):
            out = t5_encode(pq, cfg_q, input_ids=ids)
            return float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))

        plain = drift(quantize_encoder_ffn(params, groups=1))
        smooth = drift(quantize_encoder_ffn(params, groups=1,
                                            act_max=stats["ffn"]))
        assert smooth < 0.7 * plain, (plain, smooth)

    def test_smoothquant_fold_is_exact_in_fp32(self):
        """Folding s into (ln, rows) is algebraically exact: the smoothed
        DEQUANTIZED model at very fine quantization must match the plain
        encoder closely (the only error left is int8 rounding)."""
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            _smooth_factors,
        )

        rng = np.random.default_rng(0)
        l_dim, d, f = 2, 16, 24
        w = rng.normal(size=(l_dim, d, f)).astype(np.float32)
        act = rng.uniform(0.5, 2.0, size=(l_dim, d)).astype(np.float32)
        s = _smooth_factors(act, [w], 0.5)
        ln = rng.normal(size=(l_dim, d)).astype(np.float32)
        x = rng.normal(size=(l_dim, 8, d)).astype(np.float32)
        for li in range(l_dim):
            a = (x[li] * ln[li]) @ w[li]
            b = (x[li] * (ln[li] / s[li])) @ (w[li] * s[li][:, None])
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


class TestModel:
    def _cfg(self, **kw):
        return T5Config.small_test(
            d_model=64, d_ff=128, num_heads=4, d_kv=16,
            num_encoder_layers=4, num_decoder_layers=2, **kw
        )

    def test_encoder_drift_bounded_at_depth(self):
        cfg = self._cfg()
        params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, 2000)
        mask = (ids % 7 != 0).astype(jnp.int32)  # ragged mask path too
        ref = t5_encode(params, cfg, input_ids=ids, attention_mask=mask)
        pq = quantize_encoder_ffn(params)
        out = t5_encode(pq, self._cfg(int8_encoder_ffn=True),
                        input_ids=ids, attention_mask=mask)
        assert _cos(out, ref) > 0.995
        # original params must be untouched (frozen-LM invariant)
        assert "ffn_q8" not in params["encoder"]
        np.testing.assert_array_equal(
            np.asarray(params["encoder"]["ffn"]["wi_0"]),
            np.asarray(pq["encoder"]["ffn"]["wi_0"]),
        )

    def test_missing_ffn_q8_raises(self):
        cfg = self._cfg(int8_encoder_ffn=True)
        params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        ids = jnp.zeros((1, 8), jnp.int32)
        with pytest.raises(ValueError, match="quantize_encoder_ffn"):
            t5_encode(params, cfg, input_ids=ids)

    def test_composes_with_fused_attention(self):
        cfg = self._cfg(fused_encoder_attention=True)
        params = init_t5_params(jax.random.PRNGKey(2), cfg, jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 2000)
        ref = t5_encode(params, cfg, input_ids=ids)
        pq = quantize_encoder_ffn(params)
        out = t5_encode(
            pq, self._cfg(fused_encoder_attention=True,
                          int8_encoder_ffn=True),
            input_ids=ids,
        )
        assert _cos(out, ref) > 0.995


class TestAttnProjections:
    """int8 encoder attention projections (cfg.int8_encoder_attn):
    fused_t5_ln_qkv_q8 + bf16 attention core + fused_oproj_residual_q8."""

    def test_qkv_kernel_matches_dequantized_math(self):
        from explicit_alignment_for_vqa_tasks_tpu.ops.fused_attention_block import (  # noqa: E501
            fused_t5_ln_qkv_q8,
        )

        d, inner, b, l, eps = 64, 48 * 2, 2, 16, 1e-6
        ks = iter(jax.random.split(jax.random.PRNGKey(5), 8))
        x = jax.random.normal(next(ks), (b, l, d), dtype=jnp.float32)
        lnw = 1.0 + 0.1 * jax.random.normal(next(ks), (d,))
        ws = [jax.random.normal(next(ks), (d, inner)) * d ** -0.5
              for _ in range(3)]
        qs = [quantize_weight_i8(w) for w in ws]
        q, k, v = fused_t5_ln_qkv_q8(
            x, lnw,
            jnp.asarray(qs[0][0]), jnp.asarray(qs[0][1]),
            jnp.asarray(qs[1][0]), jnp.asarray(qs[1][1]),
            jnp.asarray(qs[2][0]), jnp.asarray(qs[2][1]), eps=eps,
        )
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        h = x * jax.lax.rsqrt(var + eps) * lnw
        for got, (wq, s) in zip((q, k, v), qs):
            want = h @ (jnp.asarray(wq, jnp.float32) * s)
            assert _cos(got, want) > 0.999

    def test_oproj_kernel_adds_residual(self):
        from explicit_alignment_for_vqa_tasks_tpu.ops.fused_attention_block import (  # noqa: E501
            fused_oproj_residual_q8,
        )

        d, inner, b, l = 64, 96, 2, 16
        ks = iter(jax.random.split(jax.random.PRNGKey(6), 4))
        res = jax.random.normal(next(ks), (b, l, d), dtype=jnp.float32)
        attn = jax.random.normal(next(ks), (b, l, inner), dtype=jnp.float32)
        wo = jax.random.normal(next(ks), (inner, d)) * inner ** -0.5
        qo, so = quantize_weight_i8(wo)
        out = fused_oproj_residual_q8(res, attn, jnp.asarray(qo),
                                      jnp.asarray(so))
        want = res + attn @ (jnp.asarray(qo, jnp.float32) * so)
        assert _cos(out, want) > 0.999

    def _cfg(self, **kw):
        return T5Config.small_test(
            d_model=64, d_ff=128, num_heads=4, d_kv=16,
            num_encoder_layers=4, num_decoder_layers=2,
            fused_encoder_attention=True, **kw
        )

    def test_full_int8_encoder_drift_bounded(self):
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            quantize_encoder_attn,
        )

        cfg = self._cfg()
        params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, 2000)
        mask = (ids % 7 != 0).astype(jnp.int32)
        ref = t5_encode(params, cfg, input_ids=ids, attention_mask=mask)
        pq = quantize_encoder_attn(quantize_encoder_ffn(params))
        out = t5_encode(
            pq, self._cfg(int8_encoder_ffn=True, int8_encoder_attn=True),
            input_ids=ids, attention_mask=mask,
        )
        assert _cos(out, ref) > 0.995

    def test_requires_fused_attention(self):
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            quantize_encoder_attn,
        )

        cfg = T5Config.small_test(
            d_model=64, d_ff=128, num_heads=4, d_kv=16,
            num_encoder_layers=2, num_decoder_layers=2,
            int8_encoder_attn=True,  # but fused_encoder_attention=False
        )
        params = quantize_encoder_attn(
            init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32))
        with pytest.raises(ValueError, match="fused_encoder_attention"):
            t5_encode(params, cfg, input_ids=jnp.zeros((1, 8), jnp.int32))

    def test_missing_attn_q8_raises(self):
        cfg = self._cfg(int8_encoder_attn=True)
        params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        with pytest.raises(ValueError, match="quantize_encoder_attn"):
            t5_encode(params, cfg, input_ids=jnp.zeros((1, 8), jnp.int32))
