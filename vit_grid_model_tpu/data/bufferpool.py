"""Refcount-probing pool for large host-side staging buffers.

A fresh multi-hundred-MB ``np.empty`` is a new anonymous mmap whose
first-touch page faults serialize in the kernel: writing one flagship
B=25 batch into a fresh allocation costs ~4 s at 94% system time vs
~0.22 s into an already-faulted buffer (docs/RESULTS.md, round 3).  The
prefetching loader and the eval staging path used to pay that storm on
every batch, because downstream holders (queued batches, in-flight
``device_put``) kept prior arrays alive while each call allocated anew.

``get`` returns a pooled array only when the pool holds the ONLY
reference to it (refcount probe) — a batch still queued, staged, viewed,
or pinned by an asynchronous transfer keeps its refcount elevated (any
holder, Python or C++ binding, owns a Python reference to the ndarray),
so handing out an aliased buffer is impossible by construction.  When
every pooled buffer is busy the call falls back to a fresh allocation
(correct, just slower), so the pool is a pure fast path.
"""

from __future__ import annotations

import sys
import threading
from typing import Dict

import numpy as np


class BufferPool:
    def __init__(self, max_per_key: int = 16):
        # the cap only bounds how many buffers may be RETAINED per key —
        # the pool grows to actual concurrent demand, never eagerly.  The
        # loader's worst case: prefetch queue (2) + consumer-held batch +
        # the batch being written, PLUS, under shuffle="buffer", the
        # ~shuffle_buffer source batches the zero-copy reservoir pins
        # (pipeline.py::_buffer_shuffle) — hence 16, not 4 (a lower cap
        # makes the reservoir allocate fresh every batch, re-paying the
        # first-touch page-fault storm the pool exists to avoid)
        self._max = max_per_key
        self._lock = threading.Lock()
        self._bufs: Dict[tuple, list] = {}

    def ensure_retention(self, n: int) -> None:
        """Raise (never lower) the per-key retention cap to ``n``.

        Called by consumers whose steady-state working set exceeds the
        default — e.g. the shuffle="buffer" reservoir pins ~shuffle_buffer
        source batches, and a cap BELOW that working set guarantees churn:
        every epoch drain releases reservoir-many buffers, the over-cap
        excess is dropped, and the next epoch re-allocates them fresh,
        re-paying the first-touch page-fault storm per epoch.  Retention
        still only grows to actual demand (nothing is pre-allocated)."""
        with self._lock:
            self._max = max(self._max, n)

    def get(self, shape, dtype=np.float32) -> np.ndarray:
        """An idle (already-faulted) array of ``shape``/``dtype``, else a
        fresh allocation.  Contents are UNINITIALIZED — callers must write
        every byte, exactly as with ``np.empty``."""
        key = (tuple(int(s) for s in shape), str(np.dtype(dtype)))
        with self._lock:
            bufs = self._bufs.setdefault(key, [])
            for arr in bufs:
                # refs while probing: the pool slot, the loop variable,
                # and getrefcount's argument == 3; any external holder
                # (queued batch, numpy view, in-flight device_put) adds
                if sys.getrefcount(arr) == 3:
                    return arr
            arr = np.empty(key[0], np.dtype(dtype))
            if len(bufs) < self._max:
                bufs.append(arr)
            return arr

    def clear(self) -> None:
        with self._lock:
            self._bufs.clear()


#: process-wide pool shared by the native assembler outputs and the
#: host staging paths (model-input repack, bf16 cast)
POOL = BufferPool()
