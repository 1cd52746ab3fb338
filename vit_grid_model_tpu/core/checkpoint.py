"""Checkpoint save/restore for framework pytrees.

The reference only ever loads torch checkpoints (``evaluation_vit.py:109``);
saving was done outside the repo.  Here both directions exist:

* orbax for native pytree checkpoints (async-safe, multi-host aware);
* ``core.torch_import`` for ingesting the reference's ``.pkt`` format;
* a plain-numpy ``.npz`` fallback when orbax is unavailable.
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Any, Optional

import jax
import numpy as np

# npz metadata key recording each leaf's pre-widening dtype, so restore can
# tell the intended bf16 -> f32 -> bf16 round trip from a lossy cast
_DTYPES_KEY = "__orig_dtypes__"


def _path_key(path) -> str:
    # DictKey -> .key, SequenceKey -> .idx, GetAttrKey (namedtuples e.g.
    # optax ScaleByAdamState) -> .name
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
        for p in path)


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {_path_key(path): np.asarray(leaf) for path, leaf in flat}


def save_params(path: str, params: Any, step: Optional[int] = None) -> str:
    """Save a param pytree.  Directory -> orbax; ``.npz`` suffix -> numpy."""
    if path.endswith(".npz"):
        flat = _flatten_with_paths(params)
        orig_dtypes = {k: str(v.dtype) for k, v in flat.items()}
        # np.savez round-trips extension dtypes (bf16) as opaque void
        # arrays that neither numpy nor JAX can read back — store them as
        # f32 (exact: bf16 ⊂ f32); restore_params casts to the model dtype
        flat = {k: (v.astype(np.float32)
                    if v.dtype == jax.numpy.bfloat16 else v)
                for k, v in flat.items()}
        np.savez(path, **flat,
                 **{_DTYPES_KEY: np.asarray(json.dumps(orig_dtypes))})
        return path
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def _is_safe_cast(src, dst) -> bool:
    try:
        return np.can_cast(np.dtype(src), np.dtype(dst), casting="safe")
    except TypeError:
        return False


def restore_params(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (an initialized pytree).
    Leaves are cast back to ``like``'s dtypes — the ``.npz`` writer stores
    bf16 leaves as f32 (exact), so that cast closes the round trip.  Any
    OTHER lossy cast (e.g. a genuine f32 checkpoint restored into a
    bf16-typed pytree, or float data into an integer leaf) warns: it
    usually means ``like`` was built with the wrong compute_dtype."""
    if path.endswith(".npz"):
        data = np.load(path)
        stored = set(data.files) - {_DTYPES_KEY}
        orig_dtypes = (json.loads(str(data[_DTYPES_KEY]))
                       if _DTYPES_KEY in data.files else {})
        ref = _flatten_with_paths(like)
        if stored != set(ref.keys()):
            missing = sorted(set(ref) - stored)[:5]
            extra = sorted(stored - set(ref))[:5]
            hint = ""
            if any(k.startswith("ema_params") for k in missing + extra):
                hint = (" (EMA leaves differ: the resume invocation's "
                        "--ema_decay does not match the saved run's — pass "
                        "the same --ema_decay as the original training run)")
            raise ValueError(
                f"checkpoint key mismatch restoring {path}{hint}: "
                f"missing={missing} extra={extra}")
        flat, _ = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        lossy = []
        for p, l in flat:
            key = _path_key(p)
            arr = data[key]
            want = getattr(l, "dtype", None)
            if want is not None and str(arr.dtype) != str(want):
                # exact round trip: the leaf was saved from `want` dtype
                # (widened on disk); casting back is lossless by
                # construction.  Old checkpoints without the metadata keep
                # the historical benefit of the doubt for f32 -> bf16.
                saved_from = orig_dtypes.get(key)
                intended = (saved_from == str(want) if saved_from is not None
                            else (arr.dtype == np.float32
                                  and want == jax.numpy.bfloat16))
                if not intended and not _is_safe_cast(arr.dtype, want):
                    lossy.append(f"{key}: {arr.dtype} -> {want}")
            leaves.append(jax.numpy.asarray(arr, dtype=want))
        if lossy:
            warnings.warn(
                f"restore_params({path}): lossy dtype casts "
                f"({len(lossy)} leaves, e.g. {lossy[:3]}) — the target "
                "pytree's dtypes do not match what the checkpoint was "
                "saved from (wrong compute_dtype?)", stacklevel=2)
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(like), leaves)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)


def save_train_state(path: str, state: Any) -> str:
    """Save the FULL train state — params, optimizer moments, schedule
    position (step), PRNG key, and EMA params if present — so ``--resume``
    continues exactly where training stopped instead of silently
    re-initializing Adam moments and warmup (the params-only trap)."""
    return save_params(path, state)


def restore_train_state(path: str, like: Any) -> Any:
    """Restore a full train state into the structure of ``like`` (a freshly
    ``init_train_state``-ed TrainState with the same TrainConfig)."""
    return restore_params(path, like)
