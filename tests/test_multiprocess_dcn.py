"""Hybrid ICI+DCN mesh across REAL processes (VERDICT r4 #4).

SURVEY §2.2/§5 names "ICI (intra-pod) / DCN (multi-slice)" as the
TPU-native collective backend; this certifies the multi-slice half: two
processes × 4 virtual CPU devices each (a process stands in for one TPU
slice) build the (dcn_data=2, data=2, model=2) hybrid mesh via
``parallel.mesh.make_mesh`` and run the flagship generate (token-equal to
single-device) plus a mapper train step (loss equal to the local
full-batch value). See tests/dcn_worker.py for the per-process program.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dcn_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_slice_hybrid_mesh(tmp_path):
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
        # 4 virtual devices per process = one simulated slice
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
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
        assert f"dcn worker {pid}/{nprocs} OK" in out
    assert (tmp_path / "dcn_host0_ok").exists()


def test_make_mesh_rejects_dcn_with_pipe():
    """pipe's ppermute ring must stay on ICI; dcn_data x pipe is refused
    loudly instead of silently building a ring over DCN."""
    from explicit_alignment_for_vqa_tasks_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="ICI"):
        make_mesh({"tpu": {"mesh": {"dcn_data": 2, "data": 2, "pipe": 2,
                                    "model": 1}}})
