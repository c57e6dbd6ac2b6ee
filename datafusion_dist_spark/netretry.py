"""Retry-with-backoff for control-plane network calls.

The reference retries every control-plane RPC (SendTasks / GetJobs /
CleanupJobs) up to 3 times with exponential backoff plus jitter before
failing the job (``networks/tonic/src/network.rs:39-50,181-283``). One
wrapper serves both in-repo Flight consumers: :func:`flight_execute`
and the ``ddspark_flight`` DataSource planner/reader. Data-plane
*mid-stream* failures are NOT retried (neither does the reference —
re-pulling a ticket is the recovery there).
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def _transient_flight_error(exc: Exception) -> bool:
    """Connection-level failures worth a retry; server-reported query
    errors (FlightServerError: parse error, UDF raise) are NOT — the
    reference fails those straight through to the caller too."""
    try:
        import pyarrow.flight as flight
    except ImportError:  # pragma: no cover - env without flight
        return isinstance(exc, (ConnectionError, OSError, TimeoutError))
    return isinstance(
        exc,
        (
            flight.FlightUnavailableError,
            flight.FlightTimedOutError,
            ConnectionError,
            OSError,
            TimeoutError,
        ),
    )


def call_with_retry(
    fn: Callable[[], T],
    attempts: int = 3,
    base_delay: float = 0.1,
    max_delay: float = 2.0,
    retryable: Callable[[Exception], bool] = _transient_flight_error,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Call ``fn`` up to ``attempts`` times; sleep
    ``min(max_delay, base_delay * 2^i) + U(0, delay/2)`` between tries
    (exponential backoff + jitter, ``network.rs:39-50``). Non-retryable
    errors and the final failure propagate unchanged — the happy path
    has zero added behavior."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 - filtered by retryable()
            if attempt == attempts - 1 or not retryable(exc):
                raise
            delay = min(max_delay, base_delay * (2**attempt))
            sleep(delay + random.uniform(0, delay / 2))
    raise AssertionError("unreachable")  # pragma: no cover
