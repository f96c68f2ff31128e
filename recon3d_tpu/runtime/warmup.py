"""Background device warm-up.

The first device->host fetch of a process pays the full device-link
establishment cost (on tunneled runtimes this is tens of seconds to
minutes, measured 84-250 s here; on a local PCIe TPU it is milliseconds).
Left alone, that stall lands inside whatever pipeline stage happens to
fetch first — run 1 of the north-star scenario recorded it as 328 s of
"load" time.

warm_device_async() moves the stall off the critical path: a daemon
thread runs one tiny jitted program and fetches the result, so backend
init + link establishment overlap the host-side work the pipeline does
anyway (image decode, tracing, compile-cache loads). Host->device and
device->host channels are both exercised. The main thread's first real
device call then finds a warm link.

Safe to call from any entry point: JAX backend initialization is
internally locked (concurrent first-use from two threads serializes
correctly), and on an already-warm process the whole thing is ~1 ms.
"""

from __future__ import annotations

import threading

_started = threading.Event()
_done = threading.Event()


def _warm() -> None:
    try:
        import jax
        import jax.numpy as jnp

        # One compile + one h2d + one d2h: float() forces completion.
        float(jax.jit(lambda a: a + 1.0)(jnp.asarray(1.0)))
    except Exception:
        # Warm-up is best-effort; real device errors surface at first use.
        pass
    finally:
        _done.set()


def warm_device_async() -> threading.Event:
    """Start the warm-up thread (idempotent). Returns the completion event
    (callers never need to wait on it; it exists for tests)."""
    if not _started.is_set():
        _started.set()
        threading.Thread(
            target=_warm, name="recon3d-device-warmup", daemon=True
        ).start()
    return _done
