"""Failure handling (SURVEY.md SS6 'Failure detection / elastic recovery').

The reference is a single-process art tool with no recovery story; the
TPU-native situation is better than it needs to be: every frame program is a
*pure* jitted function, so recovery from transient runtime faults is simply
re-calling it.  This module packages that into a retry wrapper tuned to the
failure modes actually observed in this environment (relayed TPU backend):

  * ``UNAVAILABLE: TPU worker process crashed or restarted``
  * ``INTERNAL: ... remote_compile ... HTTP 500`` / closed response bodies

Persistent faults (shape errors, OOM, lowering bugs) re-raise immediately.
"""

from __future__ import annotations

import functools
import time

TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "HTTP 500",
    "response body closed",
    "socket closed",
    "worker process crashed",
)


def is_transient(exc: Exception) -> bool:
    msg = str(exc)
    return any(m in msg for m in TRANSIENT_MARKERS)


def retry_transient(fn=None, *, retries: int = 2, backoff_s: float = 2.0):
    """Decorator/wrapper: re-invoke ``fn`` on transient runtime faults.

    Safe for jitted frame programs (pure: same inputs -> same outputs).
    Usage::

        render = retry_transient(jax.jit(frame_fn))
        ao = render(depth)
    """

    def wrap(f):
        @functools.wraps(f)
        def run(*args, **kwargs):
            attempt = 0
            while True:
                try:
                    return f(*args, **kwargs)
                except Exception as e:  # noqa: BLE001 - filtered below
                    if attempt >= retries or not is_transient(e):
                        raise
                    attempt += 1
                    time.sleep(backoff_s * attempt)

        return run

    return wrap(fn) if fn is not None else wrap
