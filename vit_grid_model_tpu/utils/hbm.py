"""HBM-exhaustion guard: turn XLA allocator dumps into actionable errors.

The 16 GB v5e envelope measured for the flagship 12hr config
(``benchmarks/hbm_envelope.py``, table in docs/RESULTS.md) bounds the
batch sizes each mode supports; when a workload exceeds it, XLA raises a
RESOURCE_EXHAUSTED error whose multi-page buffer-assignment dump buries
the one actionable fact.  ``oom_guard`` re-raises it as a one-paragraph
RuntimeError naming the workload, the batch, and the documented envelope.
"""

from __future__ import annotations

import contextlib


def is_oom_error(e: BaseException) -> bool:
    """True when ``e`` is an XLA/TPU out-of-memory failure.

    Classification is gated on the exception COMING FROM XLA — an
    ``XlaRuntimeError`` (matched by name: the class moved modules across
    jaxlib versions) or a message carrying an XLA marker — before the
    memory substrings are consulted.  An unrelated error that merely
    mentions "out of memory" (advisor r4: e.g. a loader IOError) must not
    be rewrapped as an HBM-envelope failure.
    """
    s = str(e)
    from_xla = (type(e).__name__ == "XlaRuntimeError"
                or "RESOURCE_EXHAUSTED" in s or "XLA" in s)
    if not from_xla:
        return False
    return ("RESOURCE_EXHAUSTED" in s
            or "Out of memory" in s
            or "out of memory" in s
            or "Attempting to reserve" in s)


@contextlib.contextmanager
def oom_guard(what: str, batch_size: int | None = None,
              envelope_hint: str = "see docs/RESULTS.md 'HBM envelope'"):
    """Wrap a compile/execute region; on HBM exhaustion raise a concise
    RuntimeError (chained to the original for full detail)."""
    try:
        yield
    except Exception as e:                          # noqa: BLE001
        if not is_oom_error(e):
            raise
        b = f" at batch_size={batch_size}" if batch_size is not None else ""
        raise RuntimeError(
            f"{what}{b} does not fit in this chip's HBM "
            f"(16 GB on v5e). Reduce the batch size or shard over more "
            f"devices ({envelope_hint}). Original XLA error type: "
            f"{type(e).__name__}.") from e
