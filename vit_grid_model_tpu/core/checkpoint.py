"""Checkpoint save/restore for framework pytrees.

The reference only ever loads torch checkpoints (``evaluation_vit.py:109``);
saving was done outside the repo.  Here both directions exist:

* orbax for native pytree checkpoints (async-safe, multi-host aware);
* ``core.torch_import`` for ingesting the reference's ``.pkt`` format;
* a plain-numpy ``.npz`` fallback when orbax is unavailable.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


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
        # np.savez round-trips extension dtypes (bf16) as opaque void
        # arrays that neither numpy nor JAX can read back — store them as
        # f32 (exact: bf16 ⊂ f32); restore_params casts to the model dtype
        flat = {k: (v.astype(np.float32)
                    if v.dtype == jax.numpy.bfloat16 else v)
                for k, v in flat.items()}
        np.savez(path, **flat)
        return path
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (an initialized pytree).
    Leaves are cast back to ``like``'s dtypes — the ``.npz`` writer stores
    bf16 leaves as f32 (exact), so the cast closes that round trip."""
    if path.endswith(".npz"):
        data = np.load(path)
        ref = _flatten_with_paths(like)
        if set(data.files) != set(ref.keys()):
            missing = sorted(set(ref) - set(data.files))[:5]
            extra = sorted(set(data.files) - set(ref))[:5]
            hint = ""
            if any(k.startswith("ema_params") for k in missing + extra):
                hint = (" (EMA leaves differ: the resume invocation's "
                        "--ema_decay does not match the saved run's — pass "
                        "the same --ema_decay as the original training run)")
            raise ValueError(
                f"checkpoint key mismatch restoring {path}{hint}: "
                f"missing={missing} extra={extra}")
        flat, _ = jax.tree_util.tree_flatten_with_path(like)
        leaves = [jax.numpy.asarray(data[_path_key(p)],
                                    dtype=getattr(l, "dtype", None))
                  for p, l in flat]
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
