"""Micro-tests for small utilities: dirs, profiling, device stats."""

import os
import time
import zipfile

from explicit_alignment_for_vqa_tasks_tpu.utils.dirs import (
    create_dirs,
    delete_dir,
    reset_dir,
    zip_dir,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.device_stats import (
    collect_env_info,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.profiling import (
    ThroughputMeter,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.seed import set_seed


class TestDirs:
    def test_create_reset_delete(self, tmp_path):
        target = tmp_path / "a" / "b"
        create_dirs([str(target)])
        assert target.is_dir()
        (target / "f.txt").write_text("x")
        reset_dir(str(target))
        assert target.is_dir() and not any(target.iterdir())
        delete_dir(str(target))
        assert not target.exists()

    def test_zip_dir(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        (src / "one.txt").write_text("1")
        (src / "sub").mkdir()
        (src / "sub" / "two.txt").write_text("2")
        out = tmp_path / "out.zip"
        zip_dir(str(src), str(out))
        with zipfile.ZipFile(out) as zf:
            assert sorted(zf.namelist()) == ["one.txt", "sub/two.txt"]


class TestProfiling:
    def test_throughput_meter(self):
        meter = ThroughputMeter(warmup_steps=1)
        for _ in range(3):
            with meter.step(items=10):
                time.sleep(0.01)
        summary = meter.summary()
        assert summary["steps"] == 2  # warmup excluded
        assert summary["items_per_s"] > 0
        assert summary["mean_step_s"] >= 0.01


class TestDeviceStats:
    def test_collect_env_info(self):
        info = collect_env_info()
        assert "python" in info and "jax" in info
        assert info["jax_backend"] == "cpu"  # forced by conftest


class TestSeed:
    def test_set_seed_returns_key_and_seeds_host(self):
        import random

        import numpy as np

        key = set_seed(123)
        a = (random.random(), np.random.rand())
        set_seed(123)
        b = (random.random(), np.random.rand())
        assert a == b
        assert key is not None


def test_readme_counts_are_not_stale():
    # keep the README's test-count claim from rotting badly
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "README.md"), encoding="utf-8") as fh:
        readme = fh.read()
    assert "200+ tests" in readme or "tests:" in readme.lower()


class TestWandbResumeLookup:
    """Reference resume parity (src/main.py:313-328): an existing run with
    the same experiment_name is resumed by id with resume="must"; no run
    or an unreachable API -> None (caller uses resume="allow")."""

    class _FakeApi:
        def __init__(self, runs, raise_exc=False):
            self._runs, self._raise = runs, raise_exc

        def runs(self, path, filters):
            if self._raise:
                raise ConnectionError("offline")
            assert path == "me/proj"
            assert filters == {"config.experiment_name": "exp1"}
            return self._runs

    class _FakeWandb:
        def __init__(self, runs, raise_exc=False):
            self._runs, self._raise = runs, raise_exc

        def Api(self, timeout):
            return TestWandbResumeLookup._FakeApi(self._runs, self._raise)

    def test_found_run_returns_id(self):
        from explicit_alignment_for_vqa_tasks_tpu.utils.loggers import (
            lookup_wandb_run_id,
        )

        class Run:
            id = "abc123"

        wb = self._FakeWandb([Run()])
        assert lookup_wandb_run_id(wb, "me", "proj", "exp1") == "abc123"

    def test_no_run_or_offline_returns_none(self):
        from explicit_alignment_for_vqa_tasks_tpu.utils.loggers import (
            lookup_wandb_run_id,
        )

        assert lookup_wandb_run_id(
            self._FakeWandb([]), "me", "proj", "exp1") is None
        assert lookup_wandb_run_id(
            self._FakeWandb([], raise_exc=True), "me", "proj", "exp1"
        ) is None
