"""Multi-host (multi-process) runtime initialization.

On TPU pods each host runs one process; ``jax.distributed.initialize()``
wires them into one global runtime so a single Mesh spans all chips (ICI
within a slice, DCN across slices). The reference is single-process
(SURVEY §2.2); this is the TPU-native scale-out entry point, called from
main before any device use.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_initialized = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Auto-detects TPU pod environments (jax.distributed.initialize with no
    args uses the TPU metadata server) when ``JAX_DIST_AUTO`` is set, or
    uses explicit coordinator settings from args/env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns True if distributed mode was initialized.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    auto = os.environ.get("JAX_DIST_AUTO", "") == "1"
    if not coordinator_address and not auto:
        return False

    import jax

    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
        if num_processes is None:
            num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) \
                or None
        if process_id is None:
            process_id_env = os.environ.get("JAX_PROCESS_ID")
            process_id = int(process_id_env) if process_id_env else None
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global "
        "devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True
