"""Persistent XLA compilation cache (opt-in via
``PipelineConfig.compilation_cache_dir``).

The reference pays model-load time on restart but no compile time
(torch eager); the TPU rebuild's restart cost is (a) re-encoding the
corpus — addressed by ``persist_device_caches`` — and (b) re-compiling
every jitted program, including Mosaic kernel compiles that run
REMOTELY (minutes each) on tunneled dev TPUs. JAX's persistent
compilation cache removes (b): compiled executables are keyed by
(HLO, compile options, backend version) and reloaded on the next
process start.

The cache setting is process-global; ``enable_compilation_cache`` is
idempotent for the same directory and warns (but honors the new dir)
when a different one is requested later.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

_enabled_dir: str | None = None


def enable_compilation_cache(path: str | os.PathLike) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing). Returns the resolved directory."""
    global _enabled_dir
    import jax

    resolved = str(Path(path).expanduser())
    os.makedirs(resolved, exist_ok=True)
    if _enabled_dir is not None and _enabled_dir != resolved:
        logger.warning(
            "compilation cache dir changed %s -> %s (process-global "
            "setting; programs already cached under the old dir stay "
            "there)", _enabled_dir, resolved,
        )
    jax.config.update("jax_compilation_cache_dir", resolved)
    # Cache every program, however small/fast its compile: the fused
    # funnel is one big program, but serving also compiles many small
    # bucket variants whose compiles individually sit under the 1 s
    # default threshold yet add up over a remote tunnel.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = resolved
    return resolved
