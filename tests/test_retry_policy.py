"""Failure-policy layer tests."""

import pytest

from fvd_tpu.runtime.retry import RetryExhausted, fallback_chain, retry, swallow


def test_retry_succeeds_after_failures():
    calls = []

    @retry(attempts=3, backoff_s=1.0, sleep=lambda s: calls.append(("sleep", s)))
    def flaky():
        if sum(1 for c in calls if c[0] == "try") < 2:
            calls.append(("try", None))
            raise ValueError("boom")
        return "ok"

    assert flaky() == "ok"
    # linear backoff: first wait 1.0, second wait 2.0
    assert [s for (k, s) in calls if k == "sleep"] == [1.0, 2.0]


def test_retry_exhausted_raises():
    @retry(attempts=2, backoff_s=0.0, sleep=lambda s: None)
    def always_fails():
        raise RuntimeError("nope")

    with pytest.raises(RetryExhausted) as exc:
        always_fails()
    assert exc.value.attempts == 2
    assert isinstance(exc.value.last, RuntimeError)


def test_retry_escalation_hook_fires_before_last_attempt():
    events = []

    @retry(attempts=3, backoff_s=0.0, sleep=lambda s: None,
           escalate_on_last=lambda: events.append("escalate"))
    def fails():
        events.append("try")
        raise ValueError()

    with pytest.raises(RetryExhausted):
        fails()
    assert events == ["try", "try", "escalate", "try"]


def test_retry_exponential_backoff():
    waits = []

    @retry(attempts=4, backoff_s=1.0, exponential=True, sleep=waits.append)
    def fails():
        raise ValueError()

    with pytest.raises(RetryExhausted):
        fails()
    assert waits == [1.0, 2.0, 4.0]


def test_fallback_chain_first_success_wins():
    def a():
        raise RuntimeError("down")

    def b():
        return []  # empty -> not accepted

    def c():
        return ["result"]

    assert fallback_chain([a, b, c]) == ["result"]


def test_fallback_chain_default():
    assert fallback_chain([lambda: []], default="d") == "d"


def test_swallow_isolates_failures():
    seen, errors = [], []

    def fn(x):
        if x == 2:
            raise ValueError()
        seen.append(x)

    n = swallow([1, 2, 3], fn, on_error=lambda item, e: errors.append(item))
    assert n == 1
    assert seen == [1, 3]
    assert errors == [2]
