"""ensure_scoped_vmem_limit env handling (no TPU needed)."""

import os

import pytest

from explicit_alignment_for_vqa_tasks_tpu.utils import tpu_flags


@pytest.fixture
def clean_env(monkeypatch):
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)


def test_returns_false_after_backend_init(clean_env):
    # conftest already initialized the CPU backend in this process
    import jax

    jax.devices()
    assert tpu_flags.ensure_scoped_vmem_limit(65536) is False
    assert "LIBTPU_INIT_ARGS" not in os.environ


def test_existing_higher_limit_is_kept(monkeypatch):
    monkeypatch.setenv(
        "LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=131072"
    )
    assert tpu_flags.ensure_scoped_vmem_limit(65536) is True
    assert "131072" in os.environ["LIBTPU_INIT_ARGS"]
