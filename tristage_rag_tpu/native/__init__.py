"""Native (C++) host-side components, loaded via ctypes.

The TPU owns the compute path (XLA/Pallas); these cover the host-side
hot loops where the reference leaned on native third-party code
(SURVEY.md §2.6): WordPiece tokenization (Rust `tokenizers`) and BM25
postings scoring (FAISS-adjacent C++). The shared library is built
lazily with g++ on first use and cached next to the sources; every
caller has a pure-Python fallback, so a missing toolchain degrades
gracefully.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_DIR = Path(__file__).parent
_LIB_NAME = "libtristage_native.so"
_SOURCES = ["tokenizer.cpp", "bm25.cpp"]
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build(lib_path: Path) -> bool:
    srcs = [str(_DIR / s) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if lib_path.exists() and os.path.getmtime(lib_path) >= newest_src:
        return True
    # No -march=native: the artifact must run on any host that checks
    # out the repo (a host-specific .so would SIGILL on older CPUs
    # before the pure-Python fallback could ever engage).
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        *srcs, "-o", str(lib_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        logger.info("built native library %s", lib_path)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        detail = getattr(e, "stderr", b"")
        logger.warning(
            "native build failed (%s); using pure-Python fallbacks. %s",
            e, detail[:500] if detail else "",
        )
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None on failure."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        lib_path = _DIR / _LIB_NAME
        if not _build(lib_path):
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(lib_path))
            # tokenizer
            lib.wp_create.restype = ctypes.c_void_p
            lib.wp_create.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ]
            lib.wp_encode.restype = ctypes.c_int64
            lib.wp_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            lib.wp_destroy.argtypes = [ctypes.c_void_p]
            # bm25
            lib.bm25_create.restype = ctypes.c_void_p
            lib.bm25_create.argtypes = [ctypes.c_double, ctypes.c_double]
            lib.bm25_add_doc.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.bm25_num_docs.restype = ctypes.c_int64
            lib.bm25_num_docs.argtypes = [ctypes.c_void_p]
            lib.bm25_score_query.restype = ctypes.c_int64
            lib.bm25_score_query.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.bm25_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except OSError as e:
            logger.warning("failed to load native library: %s", e)
            _load_failed = True
    return _lib


def available() -> bool:
    return load_library() is not None
