"""Axon TPU tunnel-relay liveness probe.

This development environment reaches its TPU through a local stdio relay
(`/root/.tpu_init.py`, remote_compile on 127.0.0.1:8083). When the relay
is down, the axon PJRT plugin HANGS backend initialization retrying the
transport instead of failing over (measured: a 300 s driver timeout and a
2.5 h "compile" were both this). A 2 s TCP probe lets entry points fall
back to the CPU backend cleanly. On hosts without the relay script the
axon backend is not in play and callers should skip the probe.
"""

from __future__ import annotations

import os
import socket

RELAY_SCRIPT = "/root/.tpu_init.py"
RELAY_PORT = 8083


def tunnel_alive(port: int = RELAY_PORT, timeout: float = 2.0) -> bool:
    """True iff the local tunnel relay accepts TCP connections."""
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=timeout):
            return True
    except OSError:
        return False


def axon_expected() -> bool:
    """True iff this process would initialize the tunneled axon backend:
    JAX_PLATFORMS is unset or includes 'axon', and the relay script exists
    (i.e. we are in the tunneled environment at all)."""
    forced = os.environ.get("JAX_PLATFORMS", "")
    axonish = forced == "" or "axon" in forced.split(",")
    return axonish and os.path.exists(RELAY_SCRIPT)


def force_cpu_if_tunnel_dead(warn: bool = True) -> bool:
    """Probe the relay and force the CPU backend when it is dead.

    Returns True when the fallback was applied. Must run before jax
    backend initialization; the axon plugin ignores the JAX_PLATFORMS env
    var, so ``jax.config.update`` is the only lever that works.
    """
    if not axon_expected() or tunnel_alive():
        return False
    if warn:
        import sys

        print("warning: axon TPU tunnel unreachable — falling back to "
              "the CPU backend", file=sys.stderr)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return True
