"""Long-sequence ViT fused-block variants (ViT-L path, VERDICT r2 #6):
numeric parity of "whole"/"whole_dd"/"split3" against the plain XLA
block, in pallas interpret mode on a small seq>128 tower."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.clip import (  # noqa: E402
    CLIPVisionConfig,
    clip_encode_image,
    init_clip_vision_params,
)


@pytest.fixture(scope="module")
def setup():
    # seq_len = (140/14)^2 + 1 = 101... need > 128: use image 168, patch 12
    cfg = CLIPVisionConfig(
        image_size=168, patch_size=12, width=64, num_layers=2,
        num_heads=4, projection_dim=32, dtype=jnp.float32,
    )
    assert cfg.seq_len > 128, cfg.seq_len
    params = init_clip_vision_params(jax.random.PRNGKey(0), cfg,
                                     jnp.float32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((2, 168, 168, 3)).astype(np.float32)
    )
    ref = np.asarray(clip_encode_image(params, cfg, images))
    return cfg, params, images, ref


@pytest.mark.parametrize("variant", ["", "split", "whole", "whole_dd",
                                     "split3", "split_c2", "split_fe",
                                     "split_c2fe"])
def test_long_variant_matches_xla(setup, variant):
    cfg, params, images, ref = setup
    v_cfg = dataclasses.replace(cfg, fused_block=True,
                                fused_block_long=variant)
    got = np.asarray(clip_encode_image(params, v_cfg, images))
    cos = (ref * got).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    # bf16-operand matmuls inside the kernels vs fp32 XLA: small drift
    assert np.all(cos > 0.999), (variant, cos)
