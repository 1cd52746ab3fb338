"""ctypes bindings for the native (C++) CMAQ data-plane.

``native/cmaq_loader.cc`` fuses the per-sample .npy reads, per-species
standardization and channel interleave into one GIL-free threaded pass —
the runtime counterpart of the reference's 5 DataLoader worker processes
(``evaluation_vit.py:138``) without process-spawn or pickling overhead.

The library auto-builds on first use (g++); everything degrades gracefully
to the pure-numpy ``data.assembly`` path when unavailable, so the native
plane is a pure acceleration layer with identical outputs (byte-parity
tested in tests/test_native_loader.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from datetime import datetime
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from vit_grid_model_tpu.data.assembly import SPECIES, PM25_SPECIES_INDEX
from vit_grid_model_tpu.data.bufferpool import POOL as _output_pool
from vit_grid_model_tpu.data.timeutil import (cmaq_file_name, cycle_refs,
                                              kst_to_utc)

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libcmaq_loader.so")

_lock = threading.Lock()
_lib = None
_tried = False

#: native read/assemble pool width — 4 overlaps file I/O even on small
#: hosts; raise via VGM_NATIVE_THREADS on real many-core rigs (the pass
#: scales with cores until storage saturates)
DEFAULT_THREADS = max(1, int(os.environ.get("VGM_NATIVE_THREADS", "4")))


ABI_VERSION = 5


def _build() -> bool:
    try:
        subprocess.run(["sh", os.path.join(_LIB_DIR, "build.sh")],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _try_open() -> Optional[ctypes.CDLL]:
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vg_abi_version.restype = ctypes.c_int
        if lib.vg_abi_version() != ABI_VERSION:
            return None
        lib.vg_assemble_sample.restype = ctypes.c_int64
        lib.vg_assemble_batch.restype = ctypes.c_int64
        lib.vg_load_cycle_files.restype = ctypes.c_int64
        lib.vg_unsupported_count.restype = ctypes.c_int64
        lib.vg_repack_model_input.restype = None
        lib.vg_repack_nhwc.restype = None
        return lib
    except Exception:
        return None


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.path.exists(_LIB_PATH):
            _lib = _try_open()
        # missing, unloadable, or stale-ABI .so: (re)build once.  The
        # stale library stays dlopened (harmless), but build.sh renames a
        # fresh inode into place, so the second CDLL maps the NEW file
        # rather than returning the pinned stale handle.
        if _lib is None and _build():
            _lib = _try_open()
        return _lib


def available() -> bool:
    return _load_library() is not None


def unsupported_count() -> int:
    """Loud load failures so far: files ``np.load`` would have accepted but
    the native reader had to zero-fill (also logged to stderr per file).
    Zero after a clean run; callers can diff across a workload to assert
    the native plane silently mishandled nothing."""
    lib = _load_library()
    return int(lib.vg_unsupported_count()) if lib is not None else 0


def reset_unsupported_count() -> None:
    lib = _load_library()
    if lib is not None:
        lib.vg_reset_unsupported_count()


def _c_paths(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def assemble_steps_native(times_kst: Sequence[datetime], sim_data_path: str,
                          feat_infos: Dict[str, Tuple[float, float]],
                          n_species: int, grid_shape: Tuple[int, int],
                          n_threads: int = DEFAULT_THREADS
                          ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Assemble the stacked blocks for a list of KST timesteps in one native
    call.  Returns (stack (H, W, T*(4S+4)), pm25 (T, 4, H, W)) or None when
    the native library is unavailable."""
    lib = _load_library()
    if lib is None:
        return None
    h, w = grid_shape
    t_steps = len(times_kst)
    paths, leads = [], np.zeros((t_steps, 4), np.float32)
    for ti, t in enumerate(times_kst):
        for ci, ref in enumerate(cycle_refs(kst_to_utc(t))):
            paths.append(cmaq_file_name(sim_data_path, ref))
            leads[ti, ci] = ref.lead
    means = np.asarray([feat_infos[s][0] for s in SPECIES[:n_species]],
                       np.float32)
    stds = np.asarray([feat_infos[s][1] for s in SPECIES[:n_species]],
                      np.float32)
    # pooled buffers: the native pass writes every output byte (failed
    # file loads stage zeroed planes), so no pre-zeroing is needed and a
    # reused, already-faulted allocation is safe
    out = _output_pool.get((h, w, t_steps * (4 * n_species + 4)))
    pm25 = _output_pool.get((t_steps, 4, h, w))
    lib.vg_assemble_sample(
        _c_paths(paths), ctypes.c_int64(t_steps), ctypes.c_int64(n_species),
        ctypes.c_int64(h), ctypes.c_int64(w),
        means.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(PM25_SPECIES_INDEX),
        leads.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pm25.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n_threads))
    return out, pm25


def assemble_batch_native(times_kst: Sequence[datetime], n_samples: int,
                          hist: int, n_steps: int, sim_data_path: str,
                          feat_infos: Dict[str, Tuple[float, float]],
                          n_species: int, grid_shape: Tuple[int, int],
                          n_threads: int = DEFAULT_THREADS
                          ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Assemble a consecutive batch's CMAQ tensors directly into the final
    batched layout in one native pass (``vg_assemble_batch``).

    ``times_kst`` is the UNION of the batch's step windows
    (``n_samples - 1 + n_steps`` consecutive hours); sample ``b`` keeps
    steps ``[b + hist, b + n_steps)``.  Returns
    ``(batch (B, H, W, (n_steps-hist)*(4S+4)), pm25 (U, 4, H, W))`` —
    ``pm25`` stays union-level so callers can take per-sample history
    means — or None when the native library is unavailable."""
    lib = _load_library()
    if lib is None:
        return None
    h, w = grid_shape
    n_union = len(times_kst)
    assert n_union == n_samples - 1 + n_steps, (n_union, n_samples, n_steps)
    paths, leads = [], np.zeros((n_union, 4), np.float32)
    for ti, t in enumerate(times_kst):
        for ci, ref in enumerate(cycle_refs(kst_to_utc(t))):
            paths.append(cmaq_file_name(sim_data_path, ref))
            leads[ti, ci] = ref.lead
    means = np.asarray([feat_infos[s][0] for s in SPECIES[:n_species]],
                       np.float32)
    stds = np.asarray([feat_infos[s][1] for s in SPECIES[:n_species]],
                      np.float32)
    bc = 4 * n_species + 4
    # pooled buffers: every byte of both outputs is written by the native
    # pass, so a reused, already-faulted allocation is safe
    out = _output_pool.get((n_samples, h, w, (n_steps - hist) * bc))
    pm25 = _output_pool.get((n_union, 4, h, w))
    lib.vg_assemble_batch(
        _c_paths(paths), ctypes.c_int64(n_union),
        ctypes.c_int64(n_samples), ctypes.c_int64(hist),
        ctypes.c_int64(n_steps), ctypes.c_int64(n_species),
        ctypes.c_int64(h), ctypes.c_int64(w),
        means.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(PM25_SPECIES_INDEX),
        leads.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pm25.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n_threads))
    return out, pm25


def _bf16_out(out: np.ndarray):
    """Classify the native repack output buffer by dtype NAME: True for
    bfloat16, False for float32, None for anything else (e.g. float16,
    whose 2-byte itemsize previously masqueraded as bf16 and would have
    been silently filled with bf16 bit patterns — advisor r4)."""
    name = str(out.dtype)
    if name == "float32":
        return False
    if name == "bfloat16":
        return True
    return None


def repack_model_input_native(simulation: np.ndarray, total_steps: int,
                              out: np.ndarray,
                              n_threads: int = DEFAULT_THREADS) -> bool:
    """Native (B, H, W, T*(4S+4)) -> (B, T, 4S, H, W) repack straight into
    ``out`` (f32 or bf16 — the bf16 path fuses the fast-mode host cast,
    round-to-nearest-even identical to numpy astype).  Returns False when
    the native library is unavailable or the layout doesn't apply (caller
    falls back to the numpy path)."""
    lib = _load_library()
    if (lib is None or not simulation.flags.c_contiguous
            or not out.flags.c_contiguous
            or simulation.dtype != np.float32):
        return False
    b, h, w, ch = simulation.shape
    if ch % total_steps != 0:
        return False
    bc = ch // total_steps
    n_species = (bc - 4) // 4
    if bc != 4 * n_species + 4:
        return False
    out_bf16 = _bf16_out(out)
    if out_bf16 is None:
        return False
    lib.vg_repack_model_input(
        simulation.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(b), ctypes.c_int64(h * w),
        ctypes.c_int64(total_steps), ctypes.c_int64(n_species),
        ctypes.c_void_p(out.ctypes.data), ctypes.c_int(int(out_bf16)),
        ctypes.c_int(n_threads))
    return True


def repack_nhwc_native(simulation: np.ndarray, total_steps: int,
                       pads: Tuple[int, int, int, int], out: np.ndarray,
                       n_threads: int = DEFAULT_THREADS) -> bool:
    """Native (B, H, W, T*(4S+4)) -> (B, Hp, Wp, T*4S) staging for the
    model's ``nhwc_input`` contract (``vg_repack_nhwc``): lead channels
    dropped, centered zero pad, optional fused bf16 cast.  ``pads`` is
    (pad_left, pad_top, hp, wp).  Returns False when the native library
    is unavailable or the layout doesn't apply (caller falls back to the
    byte-identical numpy path in ``assembly.sim_stack_to_nhwc_input``)."""
    lib = _load_library()
    if (lib is None or not simulation.flags.c_contiguous
            or not out.flags.c_contiguous
            or simulation.dtype != np.float32):
        return False
    b, h, w, ch = simulation.shape
    if ch % total_steps != 0:
        return False
    bc = ch // total_steps
    n_species = (bc - 4) // 4
    if bc != 4 * n_species + 4:
        return False
    pad_l, pad_t, hp, wp = pads
    if out.shape != (b, hp, wp, total_steps * (bc - 4)):
        return False
    out_bf16 = _bf16_out(out)
    if out_bf16 is None:
        return False
    lib.vg_repack_nhwc(
        simulation.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(b), ctypes.c_int64(h), ctypes.c_int64(w),
        ctypes.c_int64(total_steps), ctypes.c_int64(n_species),
        ctypes.c_int64(pad_l), ctypes.c_int64(pad_t),
        ctypes.c_int64(hp), ctypes.c_int64(wp),
        ctypes.c_void_p(out.ctypes.data), ctypes.c_int(int(out_bf16)),
        ctypes.c_int(n_threads))
    return True


def load_cycle_files_native(paths: Sequence[str], n_species: int,
                            grid_shape: Tuple[int, int],
                            n_threads: int = DEFAULT_THREADS) -> Optional[np.ndarray]:
    """Bulk-load raw cycle files -> (N, S, H, W), zero-filled faults."""
    lib = _load_library()
    if lib is None:
        return None
    h, w = grid_shape
    out = np.zeros((len(paths), n_species, h, w), np.float32)
    lib.vg_load_cycle_files(
        _c_paths(paths), ctypes.c_int64(len(paths)),
        ctypes.c_int64(n_species), ctypes.c_int64(h), ctypes.c_int64(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n_threads))
    return out
