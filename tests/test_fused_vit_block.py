"""fused_vit_block (whole encoder block in one Pallas program) parity.

The kernel fuses LN1 + QKV + block-diagonal attention + out-projection +
residual + LN2 + MLP(quickGELU) + residual; these tests run it in
interpret mode on CPU against the pure-XLA `_encoder_block` math and
through the full `clip_encode_image` tower.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.clip import (  # noqa: E402
    CLIPVisionConfig,
    _encoder_block,
    clip_encode_image,
    init_clip_vision_params,
)
from explicit_alignment_for_vqa_tasks_tpu.ops.fused_attention_block import (  # noqa: E402
    fused_vit_block,
)


def _layer0(cfg, key=0, dtype=jnp.float32):
    params = init_clip_vision_params(jax.random.PRNGKey(key), cfg, dtype)
    return jax.tree.map(lambda a: a[0], params["blocks"])


def _run_fused(x, lp, num_heads, group):
    return fused_vit_block(
        x, lp["ln1_scale"], lp["ln1_bias"],
        lp["q"], lp["q_bias"], lp["k"], lp["k_bias"],
        lp["v"], lp["v_bias"], lp["o"], lp["o_bias"],
        lp["ln2_scale"], lp["ln2_bias"],
        lp["mlp_fc"], lp["mlp_fc_bias"],
        lp["mlp_proj"], lp["mlp_proj_bias"],
        num_heads=num_heads, group=group, interpret=True,
    )


@pytest.mark.parametrize("group", [1, 2, 4])
def test_fused_vit_block_matches_xla_block(group):
    cfg = CLIPVisionConfig.small_test()
    lp = _layer0(cfg)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (8, cfg.seq_len, cfg.width)
        ).astype(np.float32)
    )
    ref = _encoder_block(lp, x, None, cfg.num_heads, 1e-5)
    got = _run_fused(x, lp, cfg.num_heads, group)
    # bf16 matmul operands inside the kernel vs fp32 XLA: bf16-level tol
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
    cos = (np.asarray(got) * np.asarray(ref)).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert np.all(cos > 0.999), cos.min()


@pytest.mark.parametrize("group", [1, 4])
def test_fused_vit_block_fast_exp(group):
    """fast_exp (bf16 softmax exp + deferred division — the short-seq
    VPU lever, fused_block_long='whole_fe'): same cosine bound as the
    exact-kernel path vs the XLA block."""
    cfg = CLIPVisionConfig.small_test()
    lp = _layer0(cfg)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal(
            (8, cfg.seq_len, cfg.width)
        ).astype(np.float32)
    )
    ref = _encoder_block(lp, x, None, cfg.num_heads, 1e-5)
    got = fused_vit_block(
        x, lp["ln1_scale"], lp["ln1_bias"],
        lp["q"], lp["q_bias"], lp["k"], lp["k_bias"],
        lp["v"], lp["v_bias"], lp["o"], lp["o_bias"],
        lp["ln2_scale"], lp["ln2_bias"],
        lp["mlp_fc"], lp["mlp_fc_bias"],
        lp["mlp_proj"], lp["mlp_proj_bias"],
        num_heads=cfg.num_heads, group=group, interpret=True,
        fast_exp=True,
    )
    cos = (np.asarray(got) * np.asarray(ref)).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert np.all(cos > 0.999), cos.min()


def test_whole_fe_selects_fast_exp_tower():
    """fused_block_long='whole_fe' routes the short-seq tower through
    the fast_exp whole-block kernel and stays cosine-close to exact."""
    cfg = CLIPVisionConfig.small_test()
    params = init_clip_vision_params(jax.random.PRNGKey(7), cfg,
                                     jnp.float32)
    rng = np.random.default_rng(8)
    images = jnp.asarray(
        rng.standard_normal((4, 28, 28, 3)).astype(np.float32)
    )
    exact = np.asarray(clip_encode_image(params, cfg, images))
    fe_cfg = dataclasses.replace(cfg, fused_block=True,
                                 fused_block_group=2,
                                 fused_block_long="whole_fe")
    fused = np.asarray(clip_encode_image(params, fe_cfg, images))
    cos = (exact * fused).sum(-1) / (
        np.linalg.norm(exact, axis=-1) * np.linalg.norm(fused, axis=-1)
    )
    assert np.all(cos > 0.999), cos


def test_split3_short_seq_path_matches_exact():
    """fused_block_long='split3' is selectable at short seq (the
    vit_b_study shootout surface): three fused programs, grouped like
    the whole-block kernel, cosine-close to the exact tower."""
    cfg = CLIPVisionConfig.small_test()
    params = init_clip_vision_params(jax.random.PRNGKey(9), cfg,
                                     jnp.float32)
    rng = np.random.default_rng(10)
    images = jnp.asarray(
        rng.standard_normal((4, 28, 28, 3)).astype(np.float32)
    )
    exact = np.asarray(clip_encode_image(params, cfg, images))
    s3_cfg = dataclasses.replace(cfg, fused_block=True,
                                 fused_block_group=2,
                                 fused_block_long="split3")
    fused = np.asarray(clip_encode_image(params, s3_cfg, images))
    cos = (exact * fused).sum(-1) / (
        np.linalg.norm(exact, axis=-1) * np.linalg.norm(fused, axis=-1)
    )
    assert np.all(cos > 0.999), cos


def test_fused_block_tower_matches_exact():
    cfg = CLIPVisionConfig.small_test()
    params = init_clip_vision_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    rng = np.random.default_rng(3)
    images = jnp.asarray(
        rng.standard_normal((4, 28, 28, 3)).astype(np.float32)
    )
    exact = np.asarray(clip_encode_image(params, cfg, images))
    fused_cfg = dataclasses.replace(cfg, fused_block=True,
                                    fused_block_group=2)
    fused = np.asarray(clip_encode_image(params, fused_cfg, images))
    cos = (exact * fused).sum(-1) / (
        np.linalg.norm(exact, axis=-1) * np.linalg.norm(fused, axis=-1)
    )
    assert np.all(cos > 0.999), cos


def test_fused_block_long_sequence_path():
    # patch 2 @ 28px -> 197 tokens > 128: takes the attention-core +
    # fused-MLP split path (bf16 matmul operands inside the MLP kernel
    # -> bf16-level tolerance vs the exact tower)
    cfg = CLIPVisionConfig.small_test(patch_size=2)
    params = init_clip_vision_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    rng = np.random.default_rng(5)
    images = jnp.asarray(
        rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    )
    exact = np.asarray(clip_encode_image(params, cfg, images))
    fused_cfg = dataclasses.replace(cfg, fused_block=True)
    fused = np.asarray(clip_encode_image(params, fused_cfg, images))
    cos = (exact * fused).sum(-1) / (
        np.linalg.norm(exact, axis=-1) * np.linalg.norm(fused, axis=-1)
    )
    assert np.all(cos > 0.999), cos


def test_fused_mlp_block_matches_xla():
    from explicit_alignment_for_vqa_tasks_tpu.ops.fused_attention_block import (
        fused_mlp_block,
    )

    D, F = 32, 128
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 9, D)).astype(np.float32))
    lns = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    lnb = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    wfc = jnp.asarray((rng.standard_normal((D, F)) * 0.1).astype(np.float32))
    bfc = jnp.asarray(rng.standard_normal(F).astype(np.float32))
    wpr = jnp.asarray((rng.standard_normal((F, D)) * 0.1).astype(np.float32))
    bpr = jnp.asarray(rng.standard_normal(D).astype(np.float32))

    x32 = np.asarray(x, np.float32)
    m = x32.mean(-1, keepdims=True)
    v = ((x32 - m) ** 2).mean(-1, keepdims=True)
    h = (x32 - m) / np.sqrt(v + 1e-5) * np.asarray(lns) + np.asarray(lnb)
    hid = h @ np.asarray(wfc) + np.asarray(bfc)
    hid = hid * (1.0 / (1.0 + np.exp(-1.702 * hid)))
    ref = x32 + hid @ np.asarray(wpr) + np.asarray(bpr)

    got = np.asarray(fused_mlp_block(x, lns, lnb, wfc, bfc, wpr, bpr,
                                     group=2, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
