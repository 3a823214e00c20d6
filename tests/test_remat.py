"""Remat correctness: gradients identical with/without rematerialization."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (  # noqa: E402
    MapperConfig,
)
from explicit_alignment_for_vqa_tasks_tpu.models.t5 import T5Config  # noqa: E402
from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (  # noqa: E402
    VCT0Config,
    init_vct0_params,
    vct0_caption_loss,
)


def test_remat_gradients_match():
    lm = T5Config.small_test()
    cfg = VCT0Config(
        lm=lm,
        mapper=MapperConfig(mapping_type="mlp", prefix_size=8,
                            d_model=lm.d_model, prefix_length=2,
                            clip_length=2),
    )
    params = init_vct0_params(jax.random.PRNGKey(0), cfg,
                              param_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    labels = jnp.asarray([[5, 6, 1], [7, 8, 1]])

    def grads_for(config):
        return jax.grad(
            lambda mp: vct0_caption_loss(mp, params["lm"], config, clip,
                                         labels)
        )(params["mapper"])

    cfg_remat = dataclasses.replace(
        cfg, lm=dataclasses.replace(lm, remat=True)
    )
    g0 = grads_for(cfg)
    g1 = grads_for(cfg_remat)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
