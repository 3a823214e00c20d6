"""Generation under a (data, model) mesh: the few-shot eval path on pods
runs model.generate with the LM tp-sharded and the batch dp-sharded
(few_shot_vqa_executor._generative_step). Sharded decode must produce the
SAME tokens as the single-device path — a KV-cache layout or collective
bug here would silently change the headline VQA answers."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (  # noqa: E402
    MapperConfig,
)
from explicit_alignment_for_vqa_tasks_tpu.models.t5 import T5Config  # noqa: E402
from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (  # noqa: E402
    VCT0Config,
    VCT0Model,
    init_vct0_params,
)
from explicit_alignment_for_vqa_tasks_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    replicate_params,
    shard_lm_params,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.attr_dict import AttrDict  # noqa: E402

S = 32099  # <extra_id_0>


@pytest.fixture(scope="module")
def setup():
    cfg = VCT0Config(
        lm=T5Config.small_test(),
        mapper=MapperConfig(
            mapping_type="mlp", prefix_size=16, d_model=32, prefix_length=3,
            clip_length=3,
        ),
    )
    params = init_vct0_params(
        jax.random.PRNGKey(0), cfg, param_dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    batch = 8
    prefix = jnp.asarray(
        rng.standard_normal((batch, 1, 16)).astype(np.float32))
    ids = np.asarray(
        rng.integers(3, 1000, size=(batch, 6)), dtype=np.int32)
    ids[:, 0] = S  # sentinel slot for the visual prefix
    ids = jnp.asarray(ids)
    mask = jnp.ones((batch, 6), dtype=jnp.int32)
    model = VCT0Model(cfg, params)
    tokens_ref, lp_ref = model.generate(prefix, ids, mask, max_new_tokens=5)
    return cfg, params, prefix, ids, mask, np.asarray(tokens_ref), \
        np.asarray(lp_ref)


@pytest.mark.parametrize("dp,tp", [(4, 2), (8, 1), (2, 4)])
def test_generate_sharded_matches_single_device(setup, dp, tp):
    cfg, params, prefix, ids, mask, tokens_ref, lp_ref = setup
    mesh = make_mesh(AttrDict(tpu={"mesh": {"data": dp, "model": tp}}))
    sharded = {
        "lm": shard_lm_params(mesh, params["lm"]),
        "mapper": replicate_params(mesh, params["mapper"]),
    }
    batch_sh = NamedSharding(mesh, P("data"))
    model = VCT0Model(cfg, sharded)
    tokens, lp = model.generate(
        jax.device_put(prefix, batch_sh),
        jax.device_put(ids, batch_sh),
        jax.device_put(mask, batch_sh),
        max_new_tokens=5,
    )
    np.testing.assert_array_equal(np.asarray(tokens), tokens_ref)
    np.testing.assert_allclose(np.asarray(lp), lp_ref, rtol=1e-4, atol=1e-5)


def test_int8_ffn_generate_sharded_matches_single_device(setup):
    """The opt-in int8 encoder FFN under a (data, model) mesh: the
    replicated ffn_q8 subtree (parallel/mesh.py spec guard) must give
    EXACTLY the single-device int8 tokens."""
    cfg, params, prefix, ids, mask, _, _ = setup
    from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
        quantize_encoder_ffn,
    )
    import dataclasses

    q_params = {"lm": quantize_encoder_ffn(params["lm"]),
                "mapper": params["mapper"]}
    q_cfg = dataclasses.replace(
        cfg, lm=dataclasses.replace(cfg.lm, int8_encoder_ffn=True))
    ref_model = VCT0Model(q_cfg, q_params)
    tokens_ref, lp_ref = ref_model.generate(prefix, ids, mask,
                                            max_new_tokens=5)

    mesh = make_mesh(AttrDict(tpu={"mesh": {"data": 4, "model": 2}}))
    sharded = {
        "lm": shard_lm_params(mesh, q_params["lm"]),
        "mapper": replicate_params(mesh, q_params["mapper"]),
    }
    batch_sh = NamedSharding(mesh, P("data"))
    model = VCT0Model(q_cfg, sharded)
    tokens, lp = model.generate(
        jax.device_put(prefix, batch_sh),
        jax.device_put(ids, batch_sh),
        jax.device_put(mask, batch_sh),
        max_new_tokens=5,
    )
    np.testing.assert_array_equal(np.asarray(tokens),
                                  np.asarray(tokens_ref))
    # logprob tolerance is looser than the bf16 test above: GSPMD may
    # regroup the pallas grid under the mesh and the int8 dequant sums
    # accumulate in a different fp32 order
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=2e-3, atol=2e-3)


def test_int8_decoder_generate_sharded_matches_single_device(setup):
    """The opt-in weight-only int8 decode step under a (data, model)
    mesh: the replicated step_q8 subtree (parallel/mesh.py spec guard)
    must give EXACTLY the single-device int8 tokens — with the bf16
    decoder matmul weights DROPPED (the production deployment,
    model_factory drop_bf16=True)."""
    cfg, params, prefix, ids, mask, _, _ = setup
    from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
        quantize_decoder_step,
    )
    import dataclasses

    q_params = {"lm": quantize_decoder_step(params["lm"], drop_bf16=True),
                "mapper": params["mapper"]}
    q_cfg = dataclasses.replace(
        cfg, lm=dataclasses.replace(cfg.lm, int8_decoder_step=True))
    ref_model = VCT0Model(q_cfg, q_params)
    tokens_ref, lp_ref = ref_model.generate(prefix, ids, mask,
                                            max_new_tokens=5)

    mesh = make_mesh(AttrDict(tpu={"mesh": {"data": 4, "model": 2}}))
    sharded = {
        "lm": shard_lm_params(mesh, q_params["lm"]),
        "mapper": replicate_params(mesh, q_params["mapper"]),
    }
    batch_sh = NamedSharding(mesh, P("data"))
    model = VCT0Model(q_cfg, sharded)
    tokens, lp = model.generate(
        jax.device_put(prefix, batch_sh),
        jax.device_put(ids, batch_sh),
        jax.device_put(mask, batch_sh),
        max_new_tokens=5,
    )
    np.testing.assert_array_equal(np.asarray(tokens),
                                  np.asarray(tokens_ref))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=2e-3, atol=2e-3)


def test_beam_generate_sharded_matches_single_device(setup):
    cfg, params, prefix, ids, mask, *_ = setup
    model = VCT0Model(cfg, params)
    tokens_ref, score_ref = model.generate(
        prefix, ids, mask, max_new_tokens=5, num_beams=3)
    mesh = make_mesh(AttrDict(tpu={"mesh": {"data": 4, "model": 2}}))
    sharded = {
        "lm": shard_lm_params(mesh, params["lm"]),
        "mapper": replicate_params(mesh, params["mapper"]),
    }
    batch_sh = NamedSharding(mesh, P("data"))
    model_s = VCT0Model(cfg, sharded)
    tokens, score = model_s.generate(
        jax.device_put(prefix, batch_sh),
        jax.device_put(ids, batch_sh),
        jax.device_put(mask, batch_sh),
        max_new_tokens=5, num_beams=3,
    )
    np.testing.assert_array_equal(np.asarray(tokens),
                                  np.asarray(tokens_ref))
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=1e-4, atol=1e-5)
