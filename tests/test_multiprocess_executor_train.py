"""EXECUTOR-DRIVEN multi-controller training across real processes.

Before round 4 the executors only supported per-host EVAL in
multi-process runs; training with a mesh would crash on device_put, and
without one would silently skip gradient sync. This certifies the full
path — VCT0Executor over a hybrid (dcn_data=2, data=2, model=1) mesh, 2
processes × 2 virtual CPU devices, process-sharded CC loader, global
batches via make_array_from_process_local_data, host-0-only
checkpointing. See tests/executor_train_worker.py for the invariants.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "executor_train_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_executor_training(tmp_path):
    nprocs = 2
    port = _free_port()
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        for key in list(env):
            if key.startswith(("PJRT_", "TPU_", "AXON_", "_AXON",
                               "PALLAS_AXON")):
                del env[key]
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(nprocs)
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(nprocs),
                 str(tmp_path)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=600)
        outputs.append(out)
    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, (
            f"worker {pid} failed rc={proc.returncode}:\n{out}"
        )
        assert f"executor train worker {pid}/{nprocs} OK" in out
    assert (tmp_path / "exec_train_host0_ok").exists()
