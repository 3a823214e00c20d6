"""Orbax checkpointing of the trainable state.

The reference saves full LightningModule checkpoints ``model_{epoch}.ckpt``
with best/last aliases (reference: src/main.py:96-110, resolution at
:35-66), but since only the mapper trains (reference: vct0.py:535-544) the
functionally-required payload is the mapper params + optimizer state —
which is what we persist (plus metadata), via Orbax.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)

_META_FILE = "checkpoint_index.json"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _index_path(saved_model_path: str) -> str:
    return os.path.join(saved_model_path, _META_FILE)


def _load_index(saved_model_path: str) -> Dict[str, Any]:
    path = _index_path(saved_model_path)
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as fh:
            return json.load(fh)
    return {"epochs": [], "best": None, "best_metric": None, "last": None}


def _save_index(saved_model_path: str, index: Dict[str, Any]) -> None:
    os.makedirs(saved_model_path, exist_ok=True)
    with open(_index_path(saved_model_path), "w", encoding="utf-8") as fh:
        json.dump(index, fh, indent=2)


def save_checkpoint(
    saved_model_path: str,
    epoch: int,
    state: Dict[str, Any],
    metric_value: Optional[float] = None,
    metric_mode: str = "min",
) -> str:
    """Save ``model_{epoch:02d}`` and update last/best aliases.

    Multi-controller runs: EVERY process must call this with the same
    path (orbax synchronizes internally and the primary host writes the
    replicated state); the index JSON below is written by host 0 only."""
    import jax

    name = f"model_{epoch:02d}"
    path = os.path.abspath(os.path.join(saved_model_path, name))
    _checkpointer().save(path, state, force=True)
    if jax.process_index() != 0:
        return path
    index = _load_index(saved_model_path)
    if name not in index["epochs"]:
        index["epochs"].append(name)
    index["last"] = name
    if metric_value is not None:
        best = index.get("best_metric")
        better = (
            best is None
            or (metric_mode == "min" and metric_value < best)
            or (metric_mode == "max" and metric_value > best)
        )
        if better:
            index["best"] = name
            index["best_metric"] = float(metric_value)
    _save_index(saved_model_path, index)
    logger.info("saved checkpoint %s", path)
    return path


def get_checkpoint_model_path(
    saved_model_path: str,
    load_epoch: int = -1,
    load_best_model: bool = False,
    load_model_path: str = "",
) -> Optional[str]:
    """Resolve which checkpoint to load (reference: src/main.py:35-66):
    explicit path > best > specific epoch > last. Returns None when nothing
    exists (\"first time to train\")."""
    if load_model_path:
        return load_model_path
    index = _load_index(saved_model_path)
    name: Optional[str] = None
    if load_best_model and index.get("best"):
        name = index["best"]
    elif load_epoch is not None and load_epoch >= 0:
        candidate = f"model_{load_epoch:02d}"
        if candidate in index["epochs"]:
            name = candidate
    elif index.get("last"):
        name = index["last"]
    if name is None:
        return None
    path = os.path.abspath(os.path.join(saved_model_path, name))
    return path if os.path.exists(path) else None


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    if template is not None:
        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        return checkpointer.restore(
            os.path.abspath(path),
            restore_args=restore_args,
        )
    return checkpointer.restore(os.path.abspath(path))
