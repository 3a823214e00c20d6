"""Process-level TPU compiler flags.

Some Pallas kernels hold more than the default 16 MB scoped-VMEM budget
(e.g. ops/fused_attention_block.fused_mlp_block keeps the full D x 4D
MLP weights resident: ~17 MB bf16 at ViT-L widths). libtpu reads its
flags from LIBTPU_INIT_ARGS at first backend initialization, so the
limit can be raised from inside Python as long as no JAX computation
has run yet (verified through the axon relay: the env var is honored
even though sitecustomize imports jax at interpreter start).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_FLAG = "--xla_tpu_scoped_vmem_limit_kib"


def ensure_scoped_vmem_limit(kib: int = 65536) -> bool:
    """Raise the scoped-VMEM compiler limit to `kib` KiB (default 64 MB).

    Must be called before the first JAX computation touches the backend.
    Returns True if the flag is (now) present at >= the requested value;
    False if a backend already initialized without it (callers should
    then avoid VMEM-hungry kernels).
    """
    current = os.environ.get("LIBTPU_INIT_ARGS", "")
    existing = None
    for tok in current.split():
        if tok.startswith(_FLAG + "="):
            existing = int(tok.split("=", 1)[1])
    if existing is not None and existing >= kib:
        return True

    import jax

    backends = getattr(jax._src.xla_bridge, "_backends", {})
    if backends:
        logger.warning(
            "ensure_scoped_vmem_limit(%d) called after backend init; "
            "flag cannot take effect in this process", kib,
        )
        return False
    if existing is None:
        os.environ["LIBTPU_INIT_ARGS"] = (
            f"{current} {_FLAG}={kib}".strip()
        )
    else:
        os.environ["LIBTPU_INIT_ARGS"] = " ".join(
            f"{_FLAG}={kib}" if tok.startswith(_FLAG + "=") else tok
            for tok in current.split()
        )
    return True
