"""Streaming query supervision (R22 analog: the Bastion supervisor with
linear-backoff restarts, /root/reference/src/main.rs:72-86 +
src/inner.rs:58-65).

The reference panics the whole child actor on any poller/forwarder exit
and lets the supervisor restart it 3s later; here the restartable unit
is a StreamingQuery and the durable state is its checkpoint — a restart
resumes from committed offsets (at-least-once; exactly-once with the
idempotent outbox sink), so supervision is just the retry loop."""

from __future__ import annotations

import time
from typing import Callable


def run_supervised(
    start_query: Callable[[], object],
    max_restarts: int = 3,
    backoff_seconds: float = 3.0,
    sleep: Callable[[float], None] = time.sleep,
    drain: bool = False,
):
    """Run ``start_query`` (a factory returning a started
    StreamingQuery over a FIXED checkpointLocation), restarting on
    failure with LINEAR backoff (attempt * backoff — the reference's
    policy). Re-raises after ``max_restarts`` consecutive failures.

    drain=True (tests/batch-drain mode): each attempt processes all
    available data then stops, instead of running until terminated.
    """
    attempt = 0
    while True:
        q = start_query()
        try:
            if drain:
                q.processAllAvailable()
                q.stop()
            q.awaitTermination()
            return q
        except Exception:
            try:
                q.stop()
            except Exception:
                pass
            attempt += 1
            if attempt > max_restarts:
                raise
            sleep(backoff_seconds * attempt)
