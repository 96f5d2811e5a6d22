"""Decay schedule formula parity (reference: decays.py, SURVEY.md §2.4)."""

import math

import pytest

from xpysom_dask_spark.functions import decays as C


def test_asymptotic():
    assert C.asymptotic(1.0, 0.0, 0, 10) == 1.0
    assert C.asymptotic(1.0, 0.0, 10, 10) == pytest.approx(1.0 / 3.0)
    # vN ignored
    assert C.asymptotic(1.0, 99.0, 5, 10) == C.asymptotic(1.0, 0.0, 5, 10)


def test_exponential():
    assert C.exponential(0.5, 0.01, 0, 10) == pytest.approx(0.5)
    assert C.exponential(0.5, 0.01, 10, 10) == pytest.approx(0.01)
    # vN == 0 falls back to -ln(0.1)/T
    v = C.exponential(1.0, 0.0, 10, 10)
    assert v == pytest.approx(0.1)


def test_linear():
    assert C.linear(1.0, 0.0, 0, 11) == 1.0
    assert C.linear(1.0, 0.0, 10, 11) == pytest.approx(0.0)
    assert C.linear(1.0, 0.0, 5, 11) == pytest.approx(0.5)
    # T == 1 guard
    assert C.linear(0.7, 0.0, 0, 1) == 0.7


def test_registry():
    assert C.resolve_decay("exponential") is C.exponential
    with pytest.raises(ValueError):
        C.resolve_decay("cosine_annealing")
