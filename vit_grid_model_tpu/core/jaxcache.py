"""Opt-in persistent XLA compilation cache for the CLI entry points.

On the axon-tunnel rig a fresh process pays minutes of recompilation for
the flagship programs (observed 4-27 min for the 12hr eval forward,
docs/RESULTS.md); the persistent cache makes repeat CLI invocations
reuse the serialized executable.  Strictly OPT-IN via
``VGM_JAX_CACHE_DIR=<dir>``: XLA:CPU AOT reloads warn about host
machine-feature mismatches ("could lead to ... SIGILL"), so silently
enabling it for everyone is not safe.  Cache keys include the jax/XLA
version and compile options, so stale-toolchain reuse is not a concern.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_persistent_cache() -> Optional[str]:
    """Point jax at ``$VGM_JAX_CACHE_DIR`` when set; call BEFORE the
    first jit.  Returns the directory when enabled, else None."""
    cache_dir = os.environ.get("VGM_JAX_CACHE_DIR")
    if not cache_dir:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    return cache_dir
