"""Multi-chip sharding dry runs on the 8-device virtual CPU mesh."""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, ".")  # repo root for __graft_entry__

from explicit_alignment_for_vqa_tasks_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    shard_batch,
    shard_lm_params,
    t5_param_specs,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.attr_dict import AttrDict  # noqa: E402


class TestMesh:
    def test_make_mesh_all_data(self):
        mesh = make_mesh(AttrDict(tpu={"mesh": {"data": -1, "model": 1}}))
        assert mesh.shape == {"data": 8, "model": 1}

    def test_make_mesh_tp(self):
        mesh = make_mesh(AttrDict(tpu={"mesh": {"data": 4, "model": 2}}))
        assert mesh.shape == {"data": 4, "model": 2}

    def test_mismatch_raises(self):
        with pytest.raises(ValueError):
            make_mesh(AttrDict(tpu={"mesh": {"data": 3, "model": 2}}))

    def test_shard_batch_passthrough_meta(self):
        mesh = make_mesh(AttrDict(tpu={"mesh": {"data": -1, "model": 1}}))
        batch = {
            "input_ids": np.zeros((16, 4), dtype=np.int32),
            "question_ids": [1, 2, 3],
        }
        out = shard_batch(mesh, batch)
        assert out["question_ids"] == [1, 2, 3]
        assert hasattr(out["input_ids"], "sharding")


class TestT5PartitionSpecs:
    def test_specs_cover_tree(self):
        import jax.numpy as jnp

        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            T5Config,
            init_t5_params,
        )

        cfg = T5Config.small_test()
        params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        specs = t5_param_specs(params)
        assert jax.tree.structure(specs) == jax.tree.structure(params)
        from jax.sharding import PartitionSpec as P

        assert specs["encoder"]["self_attn"]["q"] == P(None, None, "model")
        assert specs["encoder"]["ffn"]["wo"] == P(None, "model", None)
        assert specs["shared"] == P()

    def test_sharded_encode_matches_single_device(self):
        import jax.numpy as jnp

        from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (
            T5Config,
            init_t5_params,
            t5_encode,
        )

        cfg = T5Config(
            vocab_size=256, d_model=32, d_kv=8, num_heads=8, d_ff=64,
            num_encoder_layers=2, num_decoder_layers=2,
            relative_attention_num_buckets=8,
            relative_attention_max_distance=16, dtype=jnp.float32,
        )
        params = init_t5_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        rng = np.random.default_rng(0)
        ids = rng.integers(2, 256, size=(8, 10)).astype(np.int32)
        want = np.asarray(t5_encode(params, cfg, input_ids=ids))

        mesh = make_mesh(AttrDict(tpu={"mesh": {"data": 4, "model": 2}}))
        with mesh:
            sharded = shard_lm_params(mesh, params)
            got = np.asarray(t5_encode(sharded, cfg, input_ids=ids))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestGraftEntry:
    pytestmark = pytest.mark.heavy  # see Makefile tiers
    def test_dryrun_multichip_8(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)

    def test_dryrun_multichip_2(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(2)
