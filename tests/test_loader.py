"""BatchIterator + loggers + misc utils unit tests."""

import numpy as np
import pytest

from explicit_alignment_for_vqa_tasks_tpu.data.loader import (
    BatchIterator,
    ListDataset,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.attr_dict import AttrDict
from explicit_alignment_for_vqa_tasks_tpu.utils.metrics_history import (
    MetricsHistory,
)


def collate(samples):
    return AttrDict(rows=[s for s in samples])


class TestBatchIterator:
    def test_batching_and_valid_mask(self):
        ds = ListDataset(list(range(10)))
        it = BatchIterator(ds, batch_size=4, collate_fn=collate,
                           prefetch=0)
        batches = list(it)
        assert len(batches) == 3
        # final batch padded by repeating the last sample
        assert batches[2].rows == [8, 9, 9, 9]
        assert batches[2].sample_valid.tolist() == [True, True, False, False]
        assert batches[0].sample_valid.all()

    def test_drop_last(self):
        ds = ListDataset(list(range(10)))
        it = BatchIterator(ds, batch_size=4, collate_fn=collate,
                           drop_last=True, prefetch=0)
        assert len(list(it)) == 2

    def test_shuffle_deterministic_per_epoch(self):
        ds = ListDataset(list(range(32)))
        it = BatchIterator(ds, batch_size=8, collate_fn=collate,
                           shuffle=True, seed=3, prefetch=0)
        first = [b.rows for b in it]
        again = [b.rows for b in it]
        assert first == again  # same epoch -> same order
        it.set_epoch(1)
        other = [b.rows for b in it]
        assert first != other  # new epoch -> reshuffled
        assert sorted(sum(other, [])) == list(range(32))

    def test_prefetch_matches_sync(self):
        ds = ListDataset(list(range(23)))
        sync = [b.rows for b in BatchIterator(
            ds, batch_size=5, collate_fn=collate, prefetch=0)]
        pre = [b.rows for b in BatchIterator(
            ds, batch_size=5, collate_fn=collate, prefetch=2)]
        assert sync == pre

    def test_prefetch_propagates_errors(self):
        ds = ListDataset(list(range(8)))

        def bad_collate(samples):
            raise RuntimeError("boom")

        it = BatchIterator(ds, batch_size=4, collate_fn=bad_collate,
                           prefetch=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(it)

    def test_pool_matches_sync(self):
        """num_workers > 1 (thread-pool collate) must yield the SAME
        batches in the SAME order as synchronous iteration, including the
        padded final batch and valid masks."""
        ds = ListDataset(list(range(23)))
        sync = list(BatchIterator(
            ds, batch_size=5, collate_fn=collate, prefetch=0))
        pool = list(BatchIterator(
            ds, batch_size=5, collate_fn=collate, prefetch=2,
            num_workers=4))
        assert [b.rows for b in sync] == [b.rows for b in pool]
        for s, p in zip(sync, pool):
            assert s.sample_valid.tolist() == p.sample_valid.tolist()

    def test_pool_with_shuffle_deterministic(self):
        ds = ListDataset(list(range(32)))
        a = [b.rows for b in BatchIterator(
            ds, batch_size=8, collate_fn=collate, shuffle=True, seed=3,
            num_workers=3)]
        b = [b.rows for b in BatchIterator(
            ds, batch_size=8, collate_fn=collate, shuffle=True, seed=3,
            prefetch=0)]
        assert a == b

    def test_pool_propagates_errors(self):
        ds = ListDataset(list(range(20)))

        def bad_collate(samples):
            if 13 in samples:
                raise RuntimeError("boom13")
            return collate(samples)

        it = BatchIterator(ds, batch_size=4, collate_fn=bad_collate,
                           num_workers=3)
        with pytest.raises(RuntimeError, match="boom13"):
            list(it)

    def test_pool_early_break_cleans_up(self):
        ds = ListDataset(list(range(100)))
        it = BatchIterator(ds, batch_size=4, collate_fn=collate,
                           num_workers=4)
        for i, _ in enumerate(it):
            if i == 2:
                break  # must not hang or leak the pool


class TestMetricsHistory:
    def test_auto_extrema(self):
        h = MetricsHistory()
        for step, v in enumerate([1.0, 3.0, 2.0]):
            h.log("valid/acc", v, step)
        ex = h.auto_extrema()
        assert ex["valid/acc_auto_max"] == 3.0
        assert ex["valid/acc_auto_min"] == 1.0

    def test_epoch_step_excluded(self):
        h = MetricsHistory()
        h.log("epoch", 5, 0)
        assert not h.auto_extrema()

    def test_state_roundtrip(self):
        h = MetricsHistory()
        h.log("loss", 0.5, 1)
        h2 = MetricsHistory()
        h2.load_state_dict(h.state_dict())
        assert h2.values("loss") == [0.5]


class TestOptimization:
    def test_schedules(self):
        from explicit_alignment_for_vqa_tasks_tpu.trainers.optimization import (
            make_schedule,
        )

        def cfg(scheduler, warmup=10):
            return AttrDict(train={
                "lr": 1e-3, "scheduler": scheduler,
                "additional": {"warmup_steps": warmup},
            })

        linear = make_schedule(cfg("linear"), total_steps=100)
        assert float(linear(0)) < 1e-4
        assert abs(float(linear(10)) - 1e-3) < 1e-9
        assert float(linear(100)) < 1e-5

        cosine = make_schedule(cfg("cosine"), total_steps=100)
        assert abs(float(cosine(10)) - 1e-3) < 1e-6
        assert float(cosine(100)) <= 2e-5

        const = make_schedule(cfg("none"), total_steps=100)
        assert abs(float(const(50)) - 1e-3) < 1e-9

    def test_gradient_accumulation(self):
        import jax.numpy as jnp

        from explicit_alignment_for_vqa_tasks_tpu.trainers.optimization import (
            make_optimizer,
        )

        config = AttrDict(train={
            "lr": 0.1, "scheduler": "none", "adam_epsilon": 1e-8,
            "additional": {"warmup_steps": 0,
                           "gradient_accumulation_steps": 2,
                           "gradient_clipping": 1.0},
        })
        tx, _ = make_optimizer(config, total_steps=10)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        grads = {"w": jnp.ones(3)}
        # first micro-step: no update applied yet
        updates, state = tx.update(grads, state, params)
        assert float(jnp.abs(updates["w"]).sum()) == 0.0
        updates, state = tx.update(grads, state, params)
        assert float(jnp.abs(updates["w"]).sum()) > 0.0


class TestThreadSafeTokenizerReclaim:
    def test_copies_reclaimed_across_pools(self):
        from concurrent.futures import ThreadPoolExecutor

        from explicit_alignment_for_vqa_tasks_tpu.data.tokenization import (
            ThreadSafeTokenizer,
        )

        class Dummy:
            def __init__(self):
                self.calls = 0

            def __call__(self, text):
                self.calls += 1
                return text.upper()

        tok = ThreadSafeTokenizer(Dummy())
        # simulate per-epoch pool recreation (the leak scenario: each new
        # pool's threads used to deepcopy-and-pin forever)
        for _ in range(6):
            with ThreadPoolExecutor(max_workers=4) as pool:
                list(pool.map(tok, ["a", "b", "c", "d"] * 4))
        d = object.__getattribute__(tok, "__dict__")
        total = len(d["_assigned"]) + len(d["_free"])
        assert total <= 8, f"tokenizer copies accumulated: {total}"


class TestBatchIteratorSharding:
    def test_shards_partition_the_dataset(self):
        from explicit_alignment_for_vqa_tasks_tpu.data.loader import (
            BatchIterator,
            ListDataset,
        )

        items = [{"v": i} for i in range(10)]
        seen = []
        for shard in range(3):
            it = BatchIterator(
                ListDataset(items), batch_size=2,
                collate_fn=lambda s: [x["v"] for x in s],
                shard_id=shard, num_shards=3, pad_last_batch=False,
            )
            got = [v for batch in it for v in batch]
            assert got == list(range(shard, 10, 3))
            assert len(it) == -(-len(got) // 2)
            seen.extend(got)
        assert sorted(seen) == list(range(10))  # exact partition

    def test_padded_last_batch_marks_valid_rows(self):
        import numpy as np

        from explicit_alignment_for_vqa_tasks_tpu.data.loader import (
            BatchIterator,
            ListDataset,
        )

        items = [{"v": i} for i in range(5)]
        it = BatchIterator(
            ListDataset(items), batch_size=2,
            collate_fn=lambda s: {"v": [x["v"] for x in s]},
            shard_id=0, num_shards=2,
        )
        batches = list(it)
        # shard 0 = [0, 2, 4] -> two batches, last padded
        assert [b["v"] for b in batches] == [[0, 2], [4, 4]]
        assert np.array_equal(batches[-1]["sample_valid"], [True, False])

    def test_invalid_shard_raises(self):
        import pytest as _pytest

        from explicit_alignment_for_vqa_tasks_tpu.data.loader import (
            BatchIterator,
            ListDataset,
        )

        with _pytest.raises(ValueError):
            BatchIterator(
                ListDataset([1]), batch_size=1, collate_fn=list,
                shard_id=2, num_shards=2,
            )
