"""Native (C++) runtime components, loaded via ctypes.

Currently: the VQA eval scoring hot loop (answer normalization + annotator
matching over the full val set — ~4.5M string normalizations per eval).
Compiled on demand with g++ into a per-source-hash cached shared object;
every caller has a pure-Python fallback, so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "vqa_eval_native.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "explicit_alignment_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"vqa_eval_native_{digest}.so")
    if not os.path.exists(lib_path):
        with tempfile.TemporaryDirectory() as tmp:
            tmp_lib = os.path.join(tmp, "lib.so")
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                   _SRC, "-o", tmp_lib]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp_lib, lib_path)
        logger.info("built native VQA eval library: %s", lib_path)
    lib = ctypes.CDLL(lib_path)
    lib.vqa_normalize.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.vqa_normalize.restype = ctypes.c_int
    lib.vqa_accuracies.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    lib.vqa_accuracies.restype = None
    return lib


def get_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build_and_load()
        except Exception as exc:
            logger.warning("native VQA eval unavailable (%s); using the "
                           "Python implementation", exc)
            _LIB = None
    return _LIB


def native_available() -> bool:
    return get_library() is not None


def normalize_answer_native(text: str) -> str:
    lib = get_library()
    assert lib is not None
    buf = ctypes.create_string_buffer(4 * len(text.encode()) + 64)
    rc = lib.vqa_normalize(text.encode(), buf, len(buf))
    if rc < 0:
        raise ValueError("normalization buffer overflow")
    return buf.value.decode()


def vqa_accuracies_native(
    gt_answers: List[List[str]], predictions: List[str]
) -> np.ndarray:
    """Per-question official VQA accuracies (protocol incl. the
    normalize-only-on-disagreement rule) computed natively."""
    lib = get_library()
    assert lib is not None
    n_q = len(predictions)
    if n_q == 0:
        return np.zeros((0,), dtype=np.float64)
    n_ann = len(gt_answers[0])
    flat = (ctypes.c_char_p * (n_q * n_ann))()
    for q, answers in enumerate(gt_answers):
        assert len(answers) == n_ann, "annotator counts must match"
        for a, ans in enumerate(answers):
            flat[q * n_ann + a] = ans.encode()
    preds = (ctypes.c_char_p * n_q)()
    for q, p in enumerate(predictions):
        preds[q] = p.encode()
    out = np.zeros(n_q, dtype=np.float64)
    lib.vqa_accuracies(
        flat, preds, n_q, n_ann,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
