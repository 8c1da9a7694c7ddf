"""Retry/backoff discipline (lambda/handler.py:617-657 parity)."""

import pytest

from firebolt_cdc_lambda_spark.functions.retry import (
    is_retryable,
    retry_with_backoff,
)


def test_succeeds_after_transient_failures():
    calls = {"n": 0}
    delays = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise RuntimeError("connection reset by peer")
        return "ok"

    out = retry_with_backoff(flaky, max_attempts=10, base_delay=1.0,
                             sleep=delays.append)
    assert out == "ok" and calls["n"] == 4
    # exponential: 1, 3, 9 (+jitter <= 25%)
    assert len(delays) == 3
    for base, d in zip([1, 3, 9], delays):
        assert base <= d <= base * 1.25


def test_non_retryable_raises_immediately():
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise ValueError("syntax error in query")

    with pytest.raises(ValueError):
        retry_with_backoff(bad, sleep=lambda _: None)
    assert calls["n"] == 1


def test_exhausts_attempts():
    calls = {"n": 0}

    def always():
        calls["n"] += 1
        raise RuntimeError("throttled: too many requests")

    with pytest.raises(RuntimeError):
        retry_with_backoff(always, max_attempts=3, sleep=lambda _: None)
    assert calls["n"] == 3


def test_delay_cap():
    delays = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 8:
            raise RuntimeError("timeout")
        return 1

    retry_with_backoff(flaky, max_attempts=10, base_delay=1.0, max_delay=10.0,
                       jitter=0.0, sleep=delays.append)
    assert max(delays) == 10.0  # capped (reference caps ~4 min)


def test_classification():
    assert is_retryable(RuntimeError("HTTP 503 Slow Down"))
    assert not is_retryable(RuntimeError("column not found"))
