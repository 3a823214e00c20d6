"""Device/environment diagnostics.

TPU-native replacement for the reference's CUDA statistics printer and
environment collector (reference: src/utils/cuda_stats.py:7-22,
src/utils/collect_env.py:12-14).
"""

from __future__ import annotations

import logging
import platform
import sys
from typing import Dict

logger = logging.getLogger(__name__)


def collect_env_info() -> Dict[str, str]:
    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["jax_backend"] = jax.default_backend()
        info["device_count"] = str(jax.device_count())
        info["process_count"] = str(jax.process_count())
        devices = jax.devices()
        if devices:
            info["device_kind"] = devices[0].device_kind
    except Exception as exc:  # pragma: no cover
        info["jax"] = f"unavailable ({exc})"
    for mod in ("flax", "optax", "numpy", "transformers"):
        try:
            info[mod] = __import__(mod).__version__
        except Exception:
            pass
    return info


def print_device_statistics() -> None:
    """Log device topology + memory stats (replaces print_cuda_statistics)."""
    import jax

    info = collect_env_info()
    for key, value in info.items():
        logger.info("%s: %s", key, value)
    for device in jax.local_devices():
        try:
            stats = device.memory_stats()
            if stats:
                used = stats.get("bytes_in_use", 0) / 2**30
                limit = stats.get("bytes_limit", 0) / 2**30
                logger.info(
                    "%s memory: %.2f / %.2f GiB in use", device, used, limit
                )
        except Exception:
            logger.info("%s (no memory stats available)", device)
