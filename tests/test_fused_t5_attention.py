"""Fused T5 encoder attention: parity with the XLA path, masking, and
behavior under a sharded mesh (interpret mode on CPU)."""

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


def make_cfg(**kw):
    base = dict(
        vocab_size=256, d_model=64, d_kv=16, num_heads=4, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=2,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        dtype=jnp.float32,
    )
    base.update(kw)
    return T5Config(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = make_cfg()
    params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return cfg, params


class TestFusedT5Attention:
    def test_matches_xla_path_with_padding(self, setup):
        cfg, params = setup
        rng = np.random.default_rng(0)
        ids = rng.integers(2, 256, size=(3, 11)).astype(np.int32)
        mask = np.ones((3, 11), dtype=np.int32)
        mask[0, -4:] = 0
        mask[2, -1:] = 0
        want = np.asarray(t5_encode(
            params, cfg, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
        ))
        fused_cfg = dataclasses.replace(cfg, fused_encoder_attention=True)
        got = np.asarray(t5_encode(
            params, fused_cfg, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
        ))
        valid = mask.astype(bool)
        np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4,
                                   atol=2e-5)

    def test_odd_head_count_grouping(self, setup):
        # num_heads=2, head_dim=32 -> heads_per_block clamps to 2
        cfg = make_cfg(num_heads=2, d_kv=32)
        params = init_t5_params(jax.random.PRNGKey(1), cfg, jnp.float32)
        rng = np.random.default_rng(2)
        ids = rng.integers(2, 256, size=(2, 9)).astype(np.int32)
        mask = np.ones((2, 9), dtype=np.int32)
        want = np.asarray(t5_encode(params, cfg, input_ids=jnp.asarray(ids),
                                    attention_mask=jnp.asarray(mask)))
        fused = dataclasses.replace(cfg, fused_encoder_attention=True)
        got = np.asarray(t5_encode(params, fused, input_ids=jnp.asarray(ids),
                                   attention_mask=jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_gradients_match_xla_path(self, setup):
        """t5_attention_core_vjp: the fused kernel's custom VJP
        (recompute backward) must produce the same gradients as
        differentiating the plain XLA encoder — incl. through padded
        rows, the mapper-training flow (grads w.r.t. inputs_embeds)."""
        cfg, params = setup
        fused_cfg = dataclasses.replace(cfg, fused_encoder_attention=True)
        rng = np.random.default_rng(3)
        embeds = jnp.asarray(
            rng.standard_normal((3, 11, cfg.d_model)).astype(np.float32)
        )
        mask = np.ones((3, 11), dtype=np.int32)
        mask[0, -4:] = 0
        mask_j = jnp.asarray(mask)

        def loss(c, e, p):
            h = t5_encode(p, c, inputs_embeds=e, attention_mask=mask_j)
            return jnp.sum(jnp.square(h) * mask_j[..., None])

        g_want_e, g_want_p = jax.grad(
            lambda e, p: loss(cfg, e, p), argnums=(0, 1)
        )(embeds, params)
        g_got_e, g_got_p = jax.grad(
            lambda e, p: loss(fused_cfg, e, p), argnums=(0, 1)
        )(embeds, params)
        np.testing.assert_allclose(np.asarray(g_got_e),
                                   np.asarray(g_want_e),
                                   rtol=5e-4, atol=5e-5)
        # parameter grads (incl. the relative-position-bias embedding)
        flat_want = jax.tree.leaves(g_want_p["encoder"])
        flat_got = jax.tree.leaves(g_got_p["encoder"])
        for a, b in zip(flat_got, flat_want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    def test_caption_loss_trains_with_fused_attention(self, setup):
        """vct0_caption_loss no longer force-disables the fused path:
        value and mapper-grads match the XLA path."""
        from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (
            MapperConfig,
        )
        from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (
            VCT0Config,
            init_vct0_params,
            vct0_caption_loss,
        )

        cfg, _ = setup
        rng = np.random.default_rng(4)
        clip = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
        labels = jnp.asarray(rng.integers(2, 200, (2, 6)).astype(np.int32))

        def run(fused):
            lm_cfg = dataclasses.replace(cfg,
                                         fused_encoder_attention=fused)
            vcfg = VCT0Config(
                lm=lm_cfg,
                mapper=MapperConfig(mapping_type="mlp", prefix_size=16,
                                    d_model=cfg.d_model, prefix_length=4,
                                    clip_length=4),
            )
            params = init_vct0_params(jax.random.PRNGKey(7), vcfg,
                                      param_dtype=jnp.float32)
            val, grads = jax.value_and_grad(vct0_caption_loss)(
                params["mapper"], params["lm"], vcfg, clip, labels
            )
            return val, grads

        v_xla, g_xla = run(False)
        v_fused, g_fused = run(True)
        np.testing.assert_allclose(float(v_fused), float(v_xla), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    def test_under_sharded_mesh(self, setup):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        cfg, params = setup
        fused_cfg = dataclasses.replace(cfg, fused_encoder_attention=True)
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
        ids = (jnp.arange(8 * 10).reshape(8, 10) % 250 + 2).astype(jnp.int32)
        sharding = NamedSharding(mesh, P("data"))
        ids_sharded = jax.device_put(ids, sharding)
        mask = jax.device_put(jnp.ones((8, 10), jnp.int32), sharding)

        @jax.jit
        def enc(params, ids, mask):
            return t5_encode(params, fused_cfg, input_ids=ids,
                             attention_mask=mask)

        got = np.asarray(enc(params, ids_sharded, mask))
        want = np.asarray(t5_encode(params, fused_cfg, input_ids=ids,
                                    attention_mask=jnp.ones((8, 10),
                                                            jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
