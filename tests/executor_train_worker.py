"""Worker process for the EXECUTOR-DRIVEN multi-controller training test.

Run via subprocess (NOT collected by pytest):
    python tests/executor_train_worker.py <process_id> <num_processes> <tmpdir>

The gap this certifies (round 4): before it, the executors only
supported per-host eval under multi-process runs — training with
``use_mesh`` on a pod would either crash (device_put to a global mesh)
or, with the mesh off, silently train P independent models with no
gradient sync. Now ``VCT0Executor`` runs the real multi-controller path:

  * ``_setup_mesh`` builds the HYBRID (dcn_data=P, data, model) mesh and
    places params via make_array (parallel/mesh.py::put_host_array);
  * the CC loader feeds each process its [i::P] shard
    (data/data_loader_conceptual_captions.py), padded to the nominal
    local batch size;
  * ``BaseExecutor._shard`` assembles the global batch with
    ``make_array_from_process_local_data``;
  * host 0 alone writes the (replicated) checkpoint.

Invariants: the distributed training_step loss equals the local
full-batch loss; post-train mapper params are bit-identical across
processes; exactly one checkpoint is written.
"""

import json
import os
import sys

import numpy as np

PREFIX_SIZE = 16


def main() -> None:
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    tmpdir = sys.argv[3]

    from explicit_alignment_for_vqa_tasks_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed()

    import jax

    assert jax.process_count() == nprocs
    assert jax.local_device_count() == 2

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pathlib import Path

    import jax.numpy as jnp
    from test_executor_mesh import _build_cc_executor

    from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (
        vct0_caption_loss,
    )
    from explicit_alignment_for_vqa_tasks_tpu.parallel.mesh import (
        spans_processes,
    )
    from explicit_alignment_for_vqa_tasks_tpu.utils.attr_dict import AttrDict

    my_dir = Path(tmpdir) / f"proc{proc_id}"
    my_dir.mkdir(parents=True, exist_ok=True)
    executor = _build_cc_executor(
        my_dir, {"dcn_data": nprocs, "data": 2, "model": 1},
        train_batch_size=4,  # PER-PROCESS batch
    )
    # pods share the checkpoint filesystem: every process calls the
    # orbax save on the SAME path (it coordinates internally)
    executor.config.saved_model_path = os.path.join(tmpdir, "shared_ckpt")
    mesh = executor.mesh
    assert mesh is not None and mesh.axis_names == (
        "dcn_data", "data", "model"
    )
    assert spans_processes(mesh)

    # ---- invariant 1: one hand-built step == local full-batch loss ----
    def host_copy(x):
        return np.asarray(x.addressable_data(0))

    mapper_host = jax.tree.map(host_copy, executor.model.params["mapper"])
    lm_host = jax.tree.map(host_copy, executor.model.params["lm"])

    rng = np.random.default_rng(11)
    gbatch = nprocs * 4
    full_clip = rng.standard_normal((gbatch, PREFIX_SIZE)).astype(np.float32)
    full_labels = rng.integers(2, 1000, size=(gbatch, 6)).astype(np.int32)
    full_labels[:, -1] = -100
    local_loss = float(vct0_caption_loss(
        jax.tree.map(jnp.asarray, mapper_host),
        jax.tree.map(jnp.asarray, lm_host),
        executor.model.cfg,
        jnp.asarray(full_clip), jnp.asarray(full_labels),
    ))

    lo = proc_id * 4
    batch = AttrDict(
        clip_embeddings=full_clip[lo:lo + 4],
        labels=full_labels[lo:lo + 4],
    )
    out = executor.training_step(batch, 0)
    dist_loss = float(out["loss"])
    assert abs(dist_loss - local_loss) < 1e-5, (dist_loss, local_loss)

    # ---- invariant 2+3: full executor.train() runs the whole loop ----
    executor.train()

    from jax.experimental import multihost_utils

    leaf = np.asarray(
        jax.tree.leaves(executor.model.params["mapper"])[0]
        .addressable_data(0)
    ).ravel()[:64]
    digests = np.asarray(multihost_utils.process_allgather(leaf))
    assert np.all(digests == digests[0]), "params diverged across processes"

    # the orbax save barrier completed on every process, so the payload
    # exists for all; the index JSON is host-0's write
    assert os.path.exists(
        os.path.join(executor.config.saved_model_path, "model_00")
    )
    if proc_id == 0:
        ckpt_index = os.path.join(
            executor.config.saved_model_path, "checkpoint_index.json"
        )
        assert os.path.exists(ckpt_index), "host 0 must write the index"
        with open(ckpt_index) as fh:
            assert json.load(fh)["last"] == "model_00"
        with open(os.path.join(tmpdir, "exec_train_host0_ok"), "w") as fh:
            fh.write(f"loss={dist_loss:.6f}\n")
    print(f"executor train worker {proc_id}/{nprocs} OK: "
          f"loss={dist_loss:.6f}")


if __name__ == "__main__":
    main()
