"""Multi-host result gathering for evaluation.

The VQA protocol asserts that predictions cover EVERY annotated question
(utils/vqa_tools.py load_res_from_list), so under multi-host data
parallelism each host's predictions must be gathered to process 0 before
scoring (SURVEY §5: the reference is single-process and has no equivalent).
"""

from __future__ import annotations

import logging
import pickle
from typing import Any, List

logger = logging.getLogger(__name__)


def gather_predictions_to_host0(predictions: List[Any]) -> List[Any]:
    """All-gather per-host prediction lists; returns the concatenated list
    on every host (host 0 uses it for scoring, others may discard).

    Single-process runs return the input unchanged. Multi-host runs use
    jax's global-array all-gather over pickled payloads.
    """
    import jax

    if jax.process_count() == 1:
        return predictions

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        pickle.dumps(predictions, protocol=pickle.HIGHEST_PROTOCOL),
        dtype=np.uint8,
    )
    # exchange lengths, pad to global max, then all-gather bytes
    local_len = jnp.asarray([payload.shape[0]], dtype=jnp.int32)
    all_lens = np.asarray(
        multihost_utils.process_allgather(local_len)
    ).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros(max_len, dtype=np.uint8)
    padded[:payload.shape[0]] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), max_len)

    merged: List[Any] = []
    for proc in range(jax.process_count()):
        blob = gathered[proc, :int(all_lens[proc])].tobytes()
        merged.extend(pickle.loads(blob))
    logger.info(
        "gathered %d predictions from %d hosts", len(merged),
        jax.process_count(),
    )
    return merged


def metric_psum(value, axis_name: str = "data"):
    """In-jit scalar metric reduction over the data axis."""
    import jax

    return jax.lax.psum(value, axis_name)
