"""Test harness setup: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware (the TPU-native
analogue of 'test multi-node without a cluster', SURVEY.md §4)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# This build's default matmul precision approximates f32 matmuls with bf16
# passes; golden-activation parity vs torch needs true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

REFERENCE_SRC = "/root/reference/src"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_SRC)


def add_reference_to_path():
    """Make the reference torch implementation importable for
    golden-activation parity tests.  Patches the pieces that assume a GPU
    box: ``.cuda()`` no-ops on CPU, and the interactive-debugger imports
    (``metnet3.py:11``) are stubbed."""
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import types

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    for name in ("ipdb",):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.set_trace = lambda *a, **k: None
            sys.modules[name] = mod
