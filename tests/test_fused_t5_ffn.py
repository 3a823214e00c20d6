"""fused_t5_ffn (RMS-norm + gated-gelu FFN + residual in one Pallas
program) parity and gradient tests, interpret mode on CPU."""

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
from explicit_alignment_for_vqa_tasks_tpu.ops.fused_attention_block import (  # noqa: E402
    fused_t5_ffn,
    fused_t5_ffn_vjp,
)


def _mats(D=32, F=64, gated=True, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((4, 6, D)).astype(np.float32))
    lnw = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    wi0 = jnp.asarray((rng.standard_normal((D, F)) * 0.1).astype(np.float32))
    wi1 = (jnp.asarray((rng.standard_normal((D, F)) * 0.1).astype(np.float32))
           if gated else None)
    wo = jnp.asarray((rng.standard_normal((F, D)) * 0.1).astype(np.float32))
    return x, lnw, wi0, wi1, wo


def _ref(x, lnw, wi0, wi1, wo, eps=1e-6):
    x32 = np.asarray(x, np.float64)
    var = (x32 ** 2).mean(-1, keepdims=True)
    h = x32 / np.sqrt(var + eps) * np.asarray(lnw, np.float64)
    hid = h @ np.asarray(wi0, np.float64)
    hid = 0.5 * hid * (1 + np.tanh(
        0.7978845608028654 * (hid + 0.044715 * hid ** 3)))
    if wi1 is not None:
        hid = hid * (h @ np.asarray(wi1, np.float64))
    return x32 + hid @ np.asarray(wo, np.float64)


@pytest.mark.parametrize("gated", [True, False])
def test_fused_t5_ffn_matches_reference(gated):
    x, lnw, wi0, wi1, wo = _mats(gated=gated)
    got = np.asarray(fused_t5_ffn(x, lnw, wi0, wi1, wo, group=2,
                                  interpret=True))
    ref = _ref(x, lnw, wi0, wi1, wo)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_fused_t5_ffn_vjp_grads_match_xla():
    x, lnw, wi0, wi1, wo = _mats()

    def loss_fused(x, lnw, wi0, wi1, wo):
        return jnp.sum(fused_t5_ffn_vjp(x, lnw, wi0, wi1, wo, 1e-6) ** 2)

    def loss_ref(x, lnw, wi0, wi1, wo):
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, -1, keepdims=True)
        h = x32 * jax.lax.rsqrt(var + 1e-6) * lnw
        hid = h @ wi0
        hid = 0.5 * hid * (1 + jnp.tanh(
            0.7978845608028654 * (hid + 0.044715 * hid ** 3)))
        hid = hid * (h @ wi1)
        return jnp.sum((x32 + hid @ wo) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, lnw, wi0, wi1, wo)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, lnw, wi0, wi1, wo)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-2, atol=5e-2)


def test_encoder_with_fused_ffn_matches_default():
    cfg = T5Config.small_test()
    params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, 1000, (2, 12)), jnp.int32
    )
    base = np.asarray(t5_encode(params, cfg, input_ids=ids))
    fcfg = dataclasses.replace(cfg, fused_encoder_ffn=True)
    fused = np.asarray(t5_encode(params, fcfg, input_ids=ids))
    np.testing.assert_allclose(fused, base, rtol=3e-2, atol=3e-2)
    cos = (base * fused).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(fused, axis=-1)
    )
    assert np.all(cos > 0.999)
