"""Retry with exponential backoff + jitter — the reference's transient-
error discipline (lambda/handler.py:617-657: 10 attempts, 3^n backoff
capped, jitter; retryable classification per
ERROR_HANDLING_BEST_PRACTICES.md:10-50).

In the Spark engine the MVCC-conflict retries disappear (single writer
per table per batch), but cloud-storage transients remain worth
retrying around object-store reads/writes.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable, Sequence
from typing import TypeVar

R = TypeVar("R")

RETRYABLE_MARKERS = (
    # transient storage / network shapes (the reference's retryable set
    # minus Firebolt-specific MVCC codes, lambda/handler.py:629-638)
    "timeout", "timed out", "connection reset", "connection refused",
    "throttl", "slow down", "503", "500", "too many requests",
)


def is_retryable(exc: BaseException,
                 markers: Sequence[str] = RETRYABLE_MARKERS) -> bool:
    msg = str(exc).lower()
    return any(m in msg for m in markers)


def retry_with_backoff(fn: Callable[[], R],
                       max_attempts: int = 10,
                       base_delay: float = 1.0,
                       max_delay: float = 240.0,
                       jitter: float = 0.25,
                       retryable: Callable[[BaseException], bool] = is_retryable,
                       sleep: Callable[[float], None] = time.sleep) -> R:
    """Run ``fn``; on retryable failure wait base*3^n (+ jitter, capped)
    and retry, like the reference's execute_merge_with_retry."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as exc:
            attempt += 1
            if attempt >= max_attempts or not retryable(exc):
                raise
            delay = min(base_delay * (3 ** (attempt - 1)), max_delay)
            delay *= 1.0 + random.uniform(0, jitter)
            sleep(delay)
