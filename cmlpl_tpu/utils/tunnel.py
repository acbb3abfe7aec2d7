"""Axon TPU-tunnel health checks shared by TPU-facing entry points.

Under the tunnel image, a dead pool-service relay makes every PJRT
client (`jax.devices()` included) block forever in the claim-retry
loop; observed outage 2026-08-18.  Entry points that are about to touch
the real chip call :func:`require_tunnel` first so a driver/CI run
fails in seconds with a diagnosis instead of stalling.

Best-effort by design: a reachable port does not guarantee a healthy
terminal (the claim itself can still fail), and a non-tunnel image
(no ``PALLAS_AXON_POOL_IPS``) always passes — local backends need no
relay.
"""

from __future__ import annotations

import os
import socket

# the port the plugin's pool-mode provider dials on the override host
# (axon_pjrt provider defaults; see native/pjrt_launcher.plugin_env)
RELAY_PORT = 10000


def relay_address() -> tuple[str, int]:
    host = os.environ.get("AXON_POOL_SVC_OVERRIDE") or "127.0.0.1"
    return host, RELAY_PORT


def relay_reachable(timeout: float = 5.0) -> bool:
    """True if this image doesn't use the tunnel, or its relay accepts
    TCP connections."""
    if os.environ.get("PALLAS_AXON_POOL_IPS") is None:
        return True
    try:
        with socket.create_connection(relay_address(), timeout=timeout):
            return True
    except OSError:
        return False


def require_tunnel() -> None:
    """Raise SystemExit with a diagnosis when the tunnel relay is down."""
    if relay_reachable():
        return
    host, port = relay_address()
    raise SystemExit(
        f"axon pool-service relay ({host}:{port}) is unreachable — the "
        "TPU tunnel is down and any jax.devices() call would hang in "
        "the claim-retry loop. Retry once the relay is back.")
