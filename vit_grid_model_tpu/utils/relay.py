"""Fast-fail probe for this rig's TPU relay tunnel.

The axon backend retries an unreachable relay forever, so when the
relay process has died a bare ``jax.devices()`` (and therefore any CLI
that touches a backend) hangs silently.  ``relay_alive()`` answers in
<=3 s per port; entry points check it BEFORE the first backend touch and
raise a diagnostic instead of hanging.  Scoped tightly: on machines
without the relay script it returns None and callers proceed normally.
"""

from __future__ import annotations

import os
import re
import socket
from typing import Optional

RELAY_SCRIPT = "/root/.tpu_init.py"

_DIAGNOSTIC = ("TPU relay unreachable (every port of its own script's "
               "PORTS list refused a connection); jax backend init would "
               "hang forever. Fix the tunnel and rerun, or force the CPU "
               "backend (--gpus cpu / JAX_PLATFORMS=cpu before jax init).")


def relay_alive() -> Optional[bool]:
    """None when the relay script is absent (not this rig), else whether
    any relay port accepts a TCP connection."""
    if not os.path.exists(RELAY_SCRIPT):
        return None
    with open(RELAY_SCRIPT) as f:
        m = re.match(r"PORTS\s*=\s*\[([0-9,\s]+)\]", f.readline())
    if not m:
        return None
    for port in (int(p) for p in m.group(1).split(",") if p.strip()):
        s = socket.socket()
        s.settimeout(3)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def apply_platform_env() -> None:
    """Re-assert ``JAX_PLATFORMS`` through ``jax.config``.

    On this rig the tunnel's sitecustomize registration overrides the
    environment variable (CLAUDE.md gotcha): ``JAX_PLATFORMS=cpu`` alone
    still initializes the axon plugin — which hangs forever when the
    relay is dead.  ``jax.config.update`` is the layer that wins, so the
    CLIs re-apply the env var there before any backend touch."""
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)


def require_backend_reachable(force_cpu: bool = False) -> None:
    """Raise fast (with the fix in the message) when the default backend
    would be the dead relay.  No-op when CPU is forced or off this rig.
    Also honors ``JAX_PLATFORMS=cpu`` — and makes it actually stick
    (``apply_platform_env``)."""
    apply_platform_env()
    if force_cpu or os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    if relay_alive() is False:
        raise RuntimeError(_DIAGNOSTIC)
