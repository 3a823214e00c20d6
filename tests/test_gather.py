"""Multi-host gather: single-process pass-through + in-jit metric psum."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from explicit_alignment_for_vqa_tasks_tpu.parallel.gather import (  # noqa: E402
    gather_predictions_to_host0,
    metric_psum,
)


def test_single_process_passthrough():
    preds = [{"question_id": 1, "answer": "yes"}]
    assert gather_predictions_to_host0(preds) is preds


def test_metric_psum_over_data_axis():
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, axis_names=("data",))

    @jax.jit
    def summed(x):
        return shard_map(
            lambda v: metric_psum(jnp.sum(v), "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P(),
        )(x)

    x = jnp.arange(8, dtype=jnp.float32)
    assert float(summed(x)) == float(x.sum())
