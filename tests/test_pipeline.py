"""Pipeline parallelism (GPipe over the scan-stacked T5) on the 8-device
virtual CPU mesh: parity of the 3-D-parallel (data x pipe x model) forward
loss and mapper gradients against the plain single-device path."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (  # noqa: E402
    MapperConfig,
)
from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (  # noqa: E402
    T5Config,
    init_t5_params,
    t5_forward_loss,
)
from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (  # noqa: E402
    VCT0Config,
    init_vct0_params,
    vct0_caption_loss,
)
from explicit_alignment_for_vqa_tasks_tpu.parallel.pipeline import (  # noqa: E402
    make_mesh_3d,
    pp_param_specs,
    shard_lm_params_pp,
    t5_forward_loss_pp,
    vct0_caption_loss_pp,
)


def small_cfg(**kw):
    base = dict(
        vocab_size=128, d_model=32, d_kv=4, num_heads=8, d_ff=64,
        num_encoder_layers=4, num_decoder_layers=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        dtype=jnp.float32,
    )
    base.update(kw)
    return T5Config(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    params = init_t5_params(jax.random.PRNGKey(0), cfg,
                            param_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch, enc_len, tgt_len = 8, 6, 5
    embeds = jnp.asarray(
        rng.standard_normal((batch, enc_len, cfg.d_model)).astype(np.float32)
    )
    mask = jnp.asarray(
        (rng.random((batch, enc_len)) > 0.2).astype(np.int32)
    ).at[:, 0].set(1)
    labels = np.asarray(
        rng.integers(2, cfg.vocab_size, size=(batch, tgt_len)),
        dtype=np.int32,
    )
    labels[:, -1] = -100
    labels = jnp.asarray(labels)
    ref = t5_forward_loss(params, cfg, labels, inputs_embeds=embeds,
                          attention_mask=mask)
    return cfg, params, embeds, mask, labels, float(ref)


MESHES = [(2, 2, 2, 2), (1, 4, 2, 2), (2, 4, 1, 2), (8, 1, 1, 1),
          (1, 1, 8, 4)]


class TestForwardParity:
    @pytest.mark.parametrize("dp,pp,tp,n_micro", MESHES)
    def test_loss_matches_plain_path(self, setup, dp, pp, tp, n_micro):
        cfg, params, embeds, mask, labels, ref = setup
        mesh = make_mesh_3d(8, dp, pp, tp)
        with mesh:
            sharded = shard_lm_params_pp(mesh, params)
            loss = jax.jit(
                lambda p, e, l, m: t5_forward_loss_pp(
                    p, cfg, mesh, l, e, m, n_micro=n_micro)
            )(sharded, embeds, labels, mask)
        assert np.isfinite(float(loss))
        np.testing.assert_allclose(float(loss), ref, rtol=2e-4)

    def test_remat_grads_match(self, setup):
        """cfg.remat inside pipeline stages: identical loss AND identical
        input-gradients (remat changes memory, not math)."""
        import dataclasses

        cfg, params, embeds, mask, labels, ref = setup
        cfg_r = dataclasses.replace(cfg, remat=True)
        mesh = make_mesh_3d(8, 2, 2, 2)
        with mesh:
            sharded = shard_lm_params_pp(mesh, params)

            def loss_of_embeds(e):
                return t5_forward_loss_pp(
                    sharded, cfg_r, mesh, labels, e, mask, n_micro=2)

            loss, g = jax.jit(
                jax.value_and_grad(loss_of_embeds))(embeds)

            def loss_plain(e):
                return t5_forward_loss_pp(
                    sharded, cfg, mesh, labels, e, mask, n_micro=2)

            loss0, g0 = jax.jit(jax.value_and_grad(loss_plain))(embeds)
        np.testing.assert_allclose(float(loss), float(loss0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                                   rtol=1e-5, atol=1e-7)

    def test_n_micro_invariance(self, setup):
        cfg, params, embeds, mask, labels, ref = setup
        mesh = make_mesh_3d(8, 2, 2, 2)
        with mesh:
            sharded = shard_lm_params_pp(mesh, params)
            for m in (1, 2, 4):
                loss = jax.jit(
                    lambda p, e, l, mk, m=m: t5_forward_loss_pp(
                        p, cfg, mesh, l, e, mk, n_micro=m)
                )(sharded, embeds, labels, mask)
                np.testing.assert_allclose(float(loss), ref, rtol=2e-4)


class TestSequenceParallel:
    """sp: residual stream sequence-sharded over `model` inside stages
    (all_gather before matmuls, psum_scatter after) — same loss."""

    @pytest.fixture(scope="class")
    def sp_setup(self):
        cfg = small_cfg()
        params = init_t5_params(jax.random.PRNGKey(2), cfg,
                                param_dtype=jnp.float32)
        rng = np.random.default_rng(2)
        batch, enc_len, tgt_len = 8, 8, 4  # divisible by tp in (2, 4)
        embeds = jnp.asarray(rng.standard_normal(
            (batch, enc_len, cfg.d_model)).astype(np.float32))
        mask = jnp.asarray(
            (rng.random((batch, enc_len)) > 0.2).astype(np.int32)
        ).at[:, 0].set(1)
        labels = np.asarray(
            rng.integers(2, cfg.vocab_size, size=(batch, tgt_len)),
            dtype=np.int32)
        labels[:, -1] = -100
        labels = jnp.asarray(labels)
        ref = t5_forward_loss(params, cfg, labels, inputs_embeds=embeds,
                              attention_mask=mask)
        return cfg, params, embeds, mask, labels, float(ref)

    @pytest.mark.parametrize("dp,pp,tp,n_micro",
                             [(2, 2, 2, 2), (1, 2, 4, 2), (2, 1, 4, 2)])
    def test_sp_loss_matches(self, sp_setup, dp, pp, tp, n_micro):
        cfg, params, embeds, mask, labels, ref = sp_setup
        mesh = make_mesh_3d(8, dp, pp, tp)
        with mesh:
            sharded = shard_lm_params_pp(mesh, params)
            loss = jax.jit(
                lambda p, e, l, m: t5_forward_loss_pp(
                    p, cfg, mesh, l, e, m, n_micro=n_micro,
                    sequence_parallel=True)
            )(sharded, embeds, labels, mask)
        np.testing.assert_allclose(float(loss), ref, rtol=2e-4)

    def test_sp_indivisible_length_raises(self, sp_setup):
        cfg, params, embeds, mask, labels, _ = sp_setup
        mesh = make_mesh_3d(8, 2, 2, 2)
        with pytest.raises(ValueError, match="sequence_parallel"):
            t5_forward_loss_pp(params, cfg, mesh, labels, embeds[:, :7],
                               mask[:, :7], sequence_parallel=True)

    def test_sp_encode_autopads_indivisible_length(self, sp_setup):
        """The EVAL twin pads sp-indivisible lengths with masked columns
        instead of crashing (eval prompt lengths aren't fully
        user-controlled); real positions are exact vs the single-device
        encoder."""
        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import t5_encode
        from explicit_alignment_for_vqa_tasks_tpu.parallel.pipeline import (
            t5_encode_pp,
        )

        cfg, params, embeds, mask, labels, _ = sp_setup
        mesh = make_mesh_3d(8, 2, 2, 2)
        odd_embeds, odd_mask = embeds[:, :7], mask[:, :7]  # 7 % tp(2) != 0
        want = t5_encode(params, cfg, inputs_embeds=odd_embeds,
                         attention_mask=odd_mask)
        with mesh:
            sharded = shard_lm_params_pp(mesh, params)
            got = t5_encode_pp(sharded, cfg, mesh, odd_embeds, odd_mask,
                               n_micro=2, sequence_parallel=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_sp_grads_flow(self, sp_setup):
        cfg, params, embeds, mask, labels, _ = sp_setup
        mesh = make_mesh_3d(8, 2, 2, 2)
        with mesh:
            sharded = shard_lm_params_pp(mesh, params)

            def loss_of_embeds(e):
                return t5_forward_loss_pp(
                    sharded, cfg, mesh, labels, e, mask, n_micro=2,
                    sequence_parallel=True)

            g_sp = jax.jit(jax.grad(loss_of_embeds))(embeds)

        def ref_loss(e):
            return t5_forward_loss(params, cfg, labels, inputs_embeds=e,
                                   attention_mask=mask)

        g_ref = jax.grad(ref_loss)(embeds)
        np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                                   rtol=5e-3, atol=1e-5)


class TestValidation:
    def test_indivisible_layers_raise(self, setup):
        cfg, params, embeds, mask, labels, _ = setup
        mesh = make_mesh_3d(8, 1, 8, 1)  # pipe=8 does not divide 4 layers
        with pytest.raises(ValueError, match="not divisible by pipe"):
            t5_forward_loss_pp(params, cfg, mesh, labels, embeds, mask)

    def test_indivisible_batch_raises(self, setup):
        cfg, params, embeds, mask, labels, _ = setup
        mesh = make_mesh_3d(8, 2, 2, 2)
        with pytest.raises(ValueError, match="batch"):
            t5_forward_loss_pp(params, cfg, mesh, labels[:6], embeds[:6],
                               mask[:6], n_micro=2)

    def test_specs_cover_tree(self, setup):
        cfg, params, *_ = setup
        specs = pp_param_specs(params)
        flat_p = jax.tree.leaves(params)
        flat_s = jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(
                x, jax.sharding.PartitionSpec)
        )
        assert len(flat_p) == len(flat_s)


class TestProductionShapes:
    def test_bf16_pp_matches_single_device_bf16(self):
        """Production compute dtype through the pipeline: same loss as the
        plain single-device bf16 path (tolerance: bf16 reduction order)."""
        cfg = small_cfg(dtype=jnp.bfloat16)
        params = init_t5_params(jax.random.PRNGKey(3), cfg,
                                param_dtype=jnp.bfloat16)
        rng = np.random.default_rng(3)
        embeds = jnp.asarray(
            rng.standard_normal((8, 8, cfg.d_model)).astype(np.float32))
        labels = jnp.asarray(
            rng.integers(2, cfg.vocab_size, size=(8, 4)), dtype=jnp.int32)
        ref = float(t5_forward_loss(params, cfg, labels,
                                    inputs_embeds=embeds))
        mesh = make_mesh_3d(8, 2, 2, 2)
        with mesh:
            sharded = shard_lm_params_pp(mesh, params)
            loss = jax.jit(
                lambda p, e, l: t5_forward_loss_pp(
                    p, cfg, mesh, l, e, n_micro=2, sequence_parallel=True)
            )(sharded, embeds, labels)
        np.testing.assert_allclose(float(loss), ref, rtol=2e-2)

    def test_t0_3b_shapes_lower(self):
        """The pipelined train step LOWERS (traces + shards) at real T0-3B
        dimensions on a (2, 2, 2) mesh — catches divisibility, spec, and
        shape bugs at production scale without paying a 3B CPU compile."""
        cfg3b = T5Config(dtype=jnp.bfloat16)  # defaults = T0-3B
        mesh = make_mesh_3d(8, 2, 2, 2)
        embeds = jax.ShapeDtypeStruct((8, 557, cfg3b.d_model), jnp.float32)
        labels = jax.ShapeDtypeStruct((8, 20), jnp.int32)
        params_shape = jax.eval_shape(
            lambda k: init_t5_params(k, cfg3b, param_dtype=jnp.bfloat16),
            jax.random.PRNGKey(0),
        )
        with mesh:
            lowered = jax.jit(
                lambda p, e, l: t5_forward_loss_pp(
                    p, cfg3b, mesh, l, e, n_micro=2)
            ).lower(params_shape, embeds, labels)
        text = lowered.as_text()
        # the GPipe body lowers as a shardy manual computation over the
        # mesh; the schedule's stage-shift appears as a collective permute
        assert "sdy.manual_computation" in text or "shard_map" in text
        assert "collective_permute" in text or "collective-permute" in text


class TestMapperGradsThroughPipeline:
    def test_grads_match_plain_path(self):
        lm_cfg = small_cfg()
        cfg = VCT0Config(
            lm=lm_cfg,
            mapper=MapperConfig(
                mapping_type="mlp", prefix_size=16, d_model=lm_cfg.d_model,
                prefix_length=4, clip_length=4,
            ),
        )
        params = init_vct0_params(jax.random.PRNGKey(1), cfg,
                                  param_dtype=jnp.float32)
        rng = np.random.default_rng(1)
        batch = 8
        clip = jnp.asarray(
            rng.standard_normal((batch, 16)).astype(np.float32))
        labels = jnp.asarray(
            rng.integers(2, lm_cfg.vocab_size, size=(batch, 5)),
            dtype=jnp.int32)

        ref_loss, ref_grads = jax.value_and_grad(vct0_caption_loss)(
            params["mapper"], params["lm"], cfg, clip, labels)

        mesh = make_mesh_3d(8, 2, 2, 2)
        with mesh:
            lm_sharded = shard_lm_params_pp(mesh, params["lm"])
            loss, grads = jax.jit(
                jax.value_and_grad(
                    lambda mp, lp, c, l: vct0_caption_loss_pp(
                        mp, lp, cfg, mesh, c, l, n_micro=2))
            )(params["mapper"], lm_sharded, clip, labels)

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)
        key = jax.tree_util.keystr
        for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(ref_grads),
                   key=lambda kv: key(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(grads),
                   key=lambda kv: key(kv[0])),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
                err_msg=f"grad mismatch at {ka} vs {kb}",
            )
