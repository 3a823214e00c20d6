"""MULTI-PROCESS (2 and 4) jax.distributed test of the eval-prediction gather.

Round-1 review finding: parallel/multihost.py and parallel/gather.py had
never executed with process_count > 1, yet the VQA eval protocol
hard-requires full prediction coverage — a broken gather would silently
corrupt the headline metric on real pods. This spawns 2 real OS processes
on the CPU backend (1 device each), wires them with
jax.distributed.initialize via the env-driven maybe_initialize_distributed
path, gathers unequal-size prediction shards, and asserts the official
coverage invariant holds on host 0.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "gather_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("nprocs", [2, 4])
def test_multi_process_gather(tmp_path, nprocs):
    port = _free_port()
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        # fresh single-device CPU backend per process; the coordinator
        # address drives maybe_initialize_distributed in the worker.
        # Scrub TPU-plugin state inherited from the parent — with
        # PJRT_LIBRARY_PATH/_AXON_REGISTERED present the child registers
        # the TPU platform regardless of JAX_PLATFORMS and the CPU
        # backend is then built without distributed state.
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
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
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
        assert f"worker {pid}/{nprocs} OK" in out
    # host 0 ran the official full-coverage invariant and recorded success
    assert (tmp_path / "host0_ok").exists()
    from gather_worker import SHARD_SIZES

    total = sum(SHARD_SIZES[:nprocs])
    assert f"gathered={total}" in (tmp_path / "host0_ok").read_text()
