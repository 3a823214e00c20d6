"""MULTI-PROCESS jax.distributed test of the TRAINING path.

Complements test_multiprocess_gather (eval-side): spawns 2 real OS
processes, builds one GLOBAL (data) mesh across them, and runs a jitted
mapper train step on a global batch. Asserts the distributed loss equals
the full-batch loss computed on a single device (token-weighted CE is a
global mean) and that the all-reduced update leaves params bit-identical
on every process.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "train_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
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
        env.pop("XLA_FLAGS", None)
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
        out, _ = proc.communicate(timeout=300)
        outputs.append(out)
    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, (
            f"worker {pid} failed rc={proc.returncode}:\n{out}"
        )
        assert f"train worker {pid}/{nprocs} OK" in out
    assert (tmp_path / "train_host0_ok").exists()
