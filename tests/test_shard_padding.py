"""Non-divisible dp batches: loud replication + eval-side padding.

Round-5 directive (VERDICT r4 #4): ``BaseExecutor._shard`` used to fall
back SILENTLY to full replication when the batch didn't divide the mesh's
data ways — a throughput cliff. Now it warns once per run, and the few-shot
eval dispatch pads the last partial batch to a data-size multiple
(mirroring the pipelined generate path's transparent padding,
explicit_alignment_for_vqa_tasks_tpu/models/vct0.py) so it stays sharded.
Reference behavior anchor: the torch loaders simply emitted partial final
batches (reference: src/data_loader_manager/data_loader_vqa2.py:557-564).
"""

import logging

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.parallel.mesh import (  # noqa: E402
    data_size,
    make_mesh,
)
from explicit_alignment_for_vqa_tasks_tpu.trainers.base_executor import (  # noqa: E402
    BaseExecutor,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.attr_dict import (  # noqa: E402
    AttrDict,
)


class _Stub:
    """Bare object carrying just the attributes _shard/_pad use."""

    def __init__(self, mesh):
        self.mesh = mesh


def _mesh_d4():
    cfg = AttrDict(tpu=AttrDict(mesh=AttrDict(data=4, model=2)))
    return make_mesh(cfg)


def test_pad_rows_to_data_multiple_group1():
    stub = _Stub(_mesh_d4())
    arr = jnp.arange(15.0).reshape(3, 5)
    padded, n = BaseExecutor._pad_rows_to_data_multiple(stub, arr)
    assert n == 3
    assert padded.shape == (4, 5)
    # pad rows repeat the final sample
    np.testing.assert_array_equal(np.asarray(padded[3]), np.asarray(arr[2]))
    np.testing.assert_array_equal(np.asarray(padded[:3]), np.asarray(arr))


def test_pad_rows_to_data_multiple_grouped():
    # 2 logical samples x 3 flat rows each (e.g. one-at-a-time segments);
    # data=4 -> pad 2 samples = 6 flat rows, repeating the LAST sample's
    # 3-row block
    stub = _Stub(_mesh_d4())
    arr = jnp.arange(6 * 2).reshape(6, 2).astype(jnp.float32)
    padded, n = BaseExecutor._pad_rows_to_data_multiple(stub, arr, group=3)
    assert n == 2
    assert padded.shape == (12, 2)
    tail = np.asarray(arr[3:6])
    np.testing.assert_array_equal(np.asarray(padded[6:9]), tail)
    np.testing.assert_array_equal(np.asarray(padded[9:12]), tail)


def test_pad_rows_noop_when_divisible_or_meshless():
    stub = _Stub(_mesh_d4())
    arr = jnp.ones((8, 3))
    padded, n = BaseExecutor._pad_rows_to_data_multiple(stub, arr)
    assert padded is arr and n == 8
    stub_nomesh = _Stub(None)
    padded, n = BaseExecutor._pad_rows_to_data_multiple(stub_nomesh,
                                                        jnp.ones((3, 2)))
    assert n == 3 and padded.shape == (3, 2)


def test_shard_warns_once_on_nondivisible(caplog):
    mesh = _mesh_d4()
    stub = _Stub(mesh)
    arr = jnp.ones((3, 2))
    with caplog.at_level(logging.WARNING):
        out1 = BaseExecutor._shard(stub, arr)
        out2 = BaseExecutor._shard(stub, arr)
    warnings = [r for r in caplog.records
                if "REPLICATED" in r.getMessage()]
    assert len(warnings) == 1  # once per run, not per batch
    assert out1.shape == (3, 2) and out2.shape == (3, 2)
    # divisible batches shard without warning
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        out = BaseExecutor._shard(stub, jnp.ones((8, 2)))
    assert not [r for r in caplog.records if "REPLICATED" in r.getMessage()]
    assert not out.sharding.is_fully_replicated
    assert data_size(mesh) == 4


@pytest.mark.heavy
def test_eval_partial_batch_stays_sharded_and_matches(tmp_path):
    """Flagship eval whose final batch (4 questions, batch_size 3 ->
    batches of 3 + 1) does NOT divide the data=4 mesh: the dispatch pads
    to 4 rows so _shard never replicates, and the padded rows change no
    predictions vs the single-device run."""
    import sys
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_e2e import build_executor, make_test_config, write_vqa_fixtures

    def build(sub, mesh_sizes):
        d = tmp_path / sub
        d.mkdir(parents=True, exist_ok=True)
        fixtures = write_vqa_fixtures(d)
        config = make_test_config(d, fixtures)
        config.model_config.lm_config["num_heads"] = 8
        config.valid.batch_size = 3
        if mesh_sizes is None:
            config.tpu.use_mesh = False
        else:
            config.tpu.mesh = mesh_sizes
        return build_executor(config)

    ref = build("ref", None)
    ref_metrics = ref.test()

    ex = build("mesh", {"data": 4, "model": 2})
    assert ex.mesh is not None

    seen_shapes = []
    orig_shard = ex._shard

    def spy(arr):
        seen_shapes.append(int(arr.shape[0]))
        out = orig_shard(arr)
        # padding upstream guarantees divisibility -> always sharded
        assert arr.shape[0] % 4 == 0
        assert not out.sharding.is_fully_replicated
        return out

    ex._shard = spy
    metrics = ex.test()
    assert seen_shapes, "eval never routed through _shard"
    assert metrics["test_evaluation/accuracy_overall"] == \
        ref_metrics["test_evaluation/accuracy_overall"]

    import pickle

    def answers(e):
        with open(os.path.join(e.config.results_path, "answers.pkl"),
                  "rb") as fh:
            return {p["question_id"]: p["answer"] for p in pickle.load(fh)}

    assert answers(ex) == answers(ref)
