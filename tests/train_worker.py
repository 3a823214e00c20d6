"""Worker process for the multi-process TRAINING test.

Run via subprocess (NOT collected by pytest):
    python tests/train_worker.py <process_id> <num_processes> <tmpdir>

Exercises the real multi-controller path the executors use on pods:
``maybe_initialize_distributed`` -> one GLOBAL (data) mesh spanning all
processes -> jitted mapper train step (value_and_grad through the frozen
LM + optax update) on a global batch assembled from per-process shards.

Invariants checked:
  * the distributed loss equals the full-batch loss computed locally
    (token-weighted CE is a global mean — dp must not change it);
  * the post-update mapper params are bit-identical across processes
    (the gradient all-reduce is deterministic and params are replicated).
"""

import os
import sys

import numpy as np

BATCH_PER_PROC = 2
PREFIX_SIZE = 16
TGT_LEN = 5


def main() -> None:
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    tmpdir = sys.argv[3]

    from explicit_alignment_for_vqa_tasks_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed()

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (
        MapperConfig,
    )
    from explicit_alignment_for_vqa_tasks_tpu.models.t5 import T5Config
    from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (
        VCT0Config,
        init_vct0_params,
        vct0_caption_loss,
    )

    assert jax.process_count() == nprocs
    assert jax.device_count() == nprocs  # 1 CPU device per process

    cfg = VCT0Config(
        lm=T5Config.small_test(),
        mapper=MapperConfig(
            mapping_type="mlp", prefix_size=PREFIX_SIZE, d_model=32,
            prefix_length=2, clip_length=2,
        ),
    )
    # same seed everywhere -> identical initial params on every process
    params = init_vct0_params(jax.random.PRNGKey(0), cfg,
                              param_dtype=jnp.float32)

    # the FULL global batch is derivable on every process (fixed seed);
    # each process contributes its own slice to the global array
    rng = np.random.default_rng(42)
    gbatch = nprocs * BATCH_PER_PROC
    full_clip = rng.standard_normal((gbatch, PREFIX_SIZE)).astype(np.float32)
    full_labels = rng.integers(
        2, 1000, size=(gbatch, TGT_LEN)).astype(np.int32)
    full_labels[:, -1] = -100

    # reference: full-batch loss on this process's local device alone
    local_loss = float(vct0_caption_loss(
        params["mapper"], params["lm"], cfg,
        jnp.asarray(full_clip), jnp.asarray(full_labels),
    ))

    mesh = Mesh(np.asarray(jax.devices()), axis_names=("data",))
    data_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())

    def to_global(host_array, sharding):
        return jax.make_array_from_process_local_data(sharding, host_array)

    lo = proc_id * BATCH_PER_PROC
    clip_g = to_global(full_clip[lo:lo + BATCH_PER_PROC], data_sh)
    labels_g = to_global(full_labels[lo:lo + BATCH_PER_PROC], data_sh)
    params_g = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            repl_sh, np.asarray(x)),
        params,
    )

    tx = optax.adamw(1e-3)
    opt_state = jax.jit(
        tx.init, out_shardings=repl_sh)(params_g["mapper"])

    @jax.jit
    def train_step(mapper_params, opt_state, lm_params, clip, labels):
        loss, grads = jax.value_and_grad(vct0_caption_loss)(
            mapper_params, lm_params, cfg, clip, labels
        )
        updates, opt_state = tx.update(grads, opt_state, mapper_params)
        return optax.apply_updates(mapper_params, updates), opt_state, loss

    new_mapper, opt_state, loss = train_step(
        params_g["mapper"], opt_state, params_g["lm"], clip_g, labels_g
    )
    dist_loss = float(loss)
    assert abs(dist_loss - local_loss) < 1e-5, (
        f"distributed loss {dist_loss} != local full-batch {local_loss}"
    )

    # post-update params identical across processes (replicated output of
    # a deterministic all-reduced step): compare a leaf's digest
    from jax.experimental import multihost_utils

    leaf = np.asarray(
        jax.tree.leaves(new_mapper)[0].addressable_data(0)
    ).ravel()[:64]
    digests = np.asarray(multihost_utils.process_allgather(leaf))
    assert np.all(digests == digests[0]), "params diverged across processes"

    if proc_id == 0:
        with open(os.path.join(tmpdir, "train_host0_ok"), "w") as fh:
            fh.write(f"loss={dist_loss:.6f}\n")
    print(f"train worker {proc_id}/{nprocs} OK: loss={dist_loss:.6f}")


if __name__ == "__main__":
    main()
