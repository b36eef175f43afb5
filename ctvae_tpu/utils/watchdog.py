"""Hang watchdog for device-result fetches.

One unattributed Pallas-kernel execution hang was observed ~7.5k steps
into an unattended round-4 run on the remote-chip tunnel. A wedged chip
cannot be recovered from inside the same process (every subsequent
dispatch blocks until the runtime itself times out), so the production
posture is: DETECT the hang at the host-side result fetch, RECORD an
incident, and let the caller fail over — bench.py reruns its CT leg
under ``force_xla_scope``; long training jobs restart from the orbax
checkpoint with ``CTVAE_FLASH_GAT=0`` (the same preemption-resume path
exercised by tests/test_checkpoint.py).

No reference counterpart (/root/reference is a single-host torch
codebase with no unattended-hang story); this is TPU-tunnel hardening.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Optional


class StepHangError(RuntimeError):
    """A device-result fetch exceeded the watchdog timeout."""


def incident_log_path() -> str:
    return os.environ.get("CTVAE_INCIDENT_LOG", "logs/incidents.jsonl")


def log_incident(payload: dict) -> None:
    """Append a JSON incident record (best-effort; never raises)."""
    try:
        path = incident_log_path()
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        payload = {"ts": time.time(), **payload}
        with open(path, "a") as f:
            f.write(json.dumps(payload) + "\n")
    except OSError:
        pass


def watchdog_call(fn, timeout_s: float,
                  context: Optional[dict] = None):
    """Run ``fn()`` (a device->host fetch) in a daemon thread and join
    with ``timeout_s``. On timeout an incident is appended to
    ``CTVAE_INCIDENT_LOG`` (default logs/incidents.jsonl) and
    :class:`StepHangError` is raised; the fetch thread is abandoned (a
    wedged chip keeps it blocked until the runtime reclaims it).

    ``timeout_s`` must dominate the worst legitimate fetch: a full
    bounded-queue drain plus one tunnel round-trip (~hundreds of ms),
    NOT a compile (call only on already-compiled executables' outputs).
    """
    out: list = []
    err: list = []

    def _fetch():
        try:
            out.append(fn())
        except Exception as e:  # noqa: BLE001 - forwarded to caller
            err.append(e)

    t = threading.Thread(target=_fetch, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        payload = {"kind": "fetch_hang", "timeout_s": timeout_s,
                   "flash_env": os.environ.get("CTVAE_FLASH_GAT", "auto"),
                   **(context or {})}
        log_incident(payload)
        raise StepHangError(
            f"device fetch exceeded {timeout_s}s watchdog: {payload}")
    if err:
        raise err[0]
    return out[0]


def watchdog_fetch(x: Any, timeout_s: float,
                   context: Optional[dict] = None) -> float:
    """``float(x)`` under :func:`watchdog_call`."""
    return watchdog_call(lambda: float(x), timeout_s, context)
