"""Checkpoint restore ACROSS topologies (VERDICT r4 #8).

Orbax restores single-device-committed arrays; the executors must
re-place them on whatever mesh is active (`_replicate_loaded`, plus the
round-3 re-replication fix). This pins the full matrix: a mapper trained
and saved under the 3-D (data, pipe, model) GPipe mesh restores
bit-identically on a single device and keeps producing the same
captioning loss, and vice versa — so checkpoints are portable between a
pod run and a one-chip debug session in both directions.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers

from test_executor_mesh import _build_cc_executor  # noqa: E402

MESH_3D = {"data": 2, "pipe": 2, "model": 2}


def _mapper_host(executor):
    return jax.tree.map(np.asarray,
                        executor.model.params["mapper"])


def _fixed_batch():
    rng = np.random.default_rng(123)
    clip = rng.standard_normal((8, 16)).astype(np.float32)
    labels = rng.integers(2, 200, size=(8, 6)).astype(np.int32)
    labels[:, -1] = -100
    return clip, labels


def _loss(executor):
    import jax.numpy as jnp

    clip, labels = _fixed_batch()
    model = executor.model
    if getattr(executor, "pipelined", False):
        from explicit_alignment_for_vqa_tasks_tpu.parallel.pipeline import (
            vct0_caption_loss_pp,
        )

        return float(vct0_caption_loss_pp(
            model.params["mapper"], model.params["lm"], model.cfg,
            executor.mesh, jnp.asarray(clip), jnp.asarray(labels),
            n_micro=executor.n_micro,
        ))
    return float(model.forward_loss(jnp.asarray(clip),
                                    jnp.asarray(labels)))


@pytest.mark.parametrize("save_mesh,restore_mesh", [
    (MESH_3D, None),    # pod run -> single-device debug session
    (None, MESH_3D),    # single-device training -> pod eval
])
def test_restore_across_topologies(tmp_path, save_mesh, restore_mesh):
    save_dir = tmp_path / "save"
    save_dir.mkdir()
    ex_a = _build_cc_executor(save_dir, save_mesh)
    assert (ex_a.mesh is not None) == (save_mesh is not None)
    ex_a.train()  # 1 epoch; saves model_00 + aliases under saved_model
    assert os.path.exists(
        os.path.join(ex_a.config.saved_model_path, "model_00")
    )
    want_mapper = _mapper_host(ex_a)
    want_loss = _loss(ex_a)

    restore_dir = tmp_path / "restore"
    restore_dir.mkdir()
    ex_b = _build_cc_executor(restore_dir, restore_mesh)
    assert (ex_b.pipelined if restore_mesh else ex_b.mesh is None)
    # point the fresh executor at the OTHER topology's checkpoint
    ex_b.config.saved_model_path = ex_a.config.saved_model_path
    path = ex_b.maybe_load_checkpoint()
    assert path is not None and "model_00" in path
    assert ex_b.current_epoch == 1  # resumes after the saved epoch

    got_mapper = _mapper_host(ex_b)
    jax.tree.map(np.testing.assert_array_equal, got_mapper, want_mapper)
    # the restored params must be usable by the ACTIVE topology's jitted
    # loss (sharded-vs-committed mixing is exactly what regressed before
    # the round-3 re-replication fix), and produce the same value
    got_loss = _loss(ex_b)
    assert np.isclose(got_loss, want_loss, rtol=1e-4), (got_loss,
                                                        want_loss)
