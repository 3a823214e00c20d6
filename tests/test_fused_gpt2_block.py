"""fused_gpt2_block parity (vs the XLA _gpt2_block math), masking,
gradient flow, and full-forward wiring — interpret mode on CPU."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.gpt2 import (  # noqa: E402
    GPT2Config,
    gpt2_forward,
    init_gpt2_params,
)
from explicit_alignment_for_vqa_tasks_tpu.ops.fused_attention_block import (  # noqa: E402
    fused_gpt2_block,
    fused_gpt2_block_vjp,
)


def _cos(a, b):
    return (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )


def test_fused_gpt2_forward_matches_default():
    cfg = GPT2Config.small_test()
    params = init_gpt2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 12)),
        jnp.int32,
    )
    base = np.asarray(gpt2_forward(params, cfg, input_ids=ids))
    fcfg = dataclasses.replace(cfg, fused_block=True)
    fused = np.asarray(gpt2_forward(params, fcfg, input_ids=ids))
    assert np.all(_cos(base, fused) > 0.999)


def test_fused_gpt2_respects_attention_mask():
    cfg = GPT2Config.small_test()
    params = init_gpt2_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10)), jnp.int32)
    mask = np.ones((2, 10), np.int32)
    mask[:, 7:] = 0  # right padding
    fcfg = dataclasses.replace(cfg, fused_block=True)
    base = np.asarray(
        gpt2_forward(params, cfg, input_ids=ids,
                     attention_mask=jnp.asarray(mask))
    )
    fused = np.asarray(
        gpt2_forward(params, fcfg, input_ids=ids,
                     attention_mask=jnp.asarray(mask))
    )
    # valid positions must agree regardless of pad-token content
    assert np.all(_cos(base[:, :7], fused[:, :7]) > 0.999)


def test_fused_gpt2_is_causal():
    cfg = GPT2Config.small_test()
    params = init_gpt2_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    rng = np.random.default_rng(5)
    ids = np.asarray(rng.integers(0, cfg.vocab_size, (1, 8)))
    fcfg = dataclasses.replace(cfg, fused_block=True)
    out1 = np.asarray(
        gpt2_forward(params, fcfg, input_ids=jnp.asarray(ids, jnp.int32))
    )
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % cfg.vocab_size  # change LAST token
    out2 = np.asarray(
        gpt2_forward(params, fcfg, input_ids=jnp.asarray(ids2, jnp.int32))
    )
    # earlier positions must be unaffected by a later-token change
    np.testing.assert_allclose(out1[:, :-1], out2[:, :-1],
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(out1[:, -1], out2[:, -1])


def test_fused_gpt2_vjp_grads_match_reference():
    cfg = GPT2Config.small_test()
    params = init_gpt2_params(jax.random.PRNGKey(6), cfg, jnp.float32)
    lp = jax.tree.map(lambda a: a[0], params["blocks"])
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 6, cfg.d_model))
                    .astype(np.float32))
    mask = jnp.ones((2, 6), jnp.int32)

    def call(fn, x):
        return fn(
            x, mask, lp["ln1_scale"], lp["ln1_bias"],
            lp["attn_qkv"], lp["attn_qkv_bias"],
            lp["attn_out"], lp["attn_out_bias"],
            lp["ln2_scale"], lp["ln2_bias"],
            lp["mlp_fc"], lp["mlp_fc_bias"],
            lp["mlp_proj"], lp["mlp_proj_bias"],
            cfg.num_heads, cfg.layer_norm_epsilon,
        )

    def kernel_fn(*a, **k):
        return fused_gpt2_block(*a[:14], num_heads=a[14], eps=a[15])

    out_k = np.asarray(call(kernel_fn, x))
    out_v = np.asarray(call(fused_gpt2_block_vjp, x))
    np.testing.assert_allclose(out_k, out_v, rtol=1e-5, atol=1e-5)

    # gradient wrt the INPUT (the path ClipCap training needs: loss ->
    # frozen GPT-2 -> mapper) vs numerical finite differences
    def loss(x):
        return jnp.sum(call(fused_gpt2_block_vjp, x) ** 2)

    g = np.asarray(jax.grad(loss)(x))
    e = 1e-3
    idx = (0, 2, 3)
    xp = np.asarray(x).copy(); xp[idx] += e
    xm = np.asarray(x).copy(); xm[idx] -= e
    num = (float(loss(jnp.asarray(xp))) - float(loss(jnp.asarray(xm)))) / (2 * e)
    assert abs(num - g[idx]) < 0.05 * max(1.0, abs(num)), (num, g[idx])
