"""Decay schedules for learning rate and neighborhood radius.

Driver-side scalar math evaluated once per epoch — no cluster involvement
(SURVEY.md §2.4).  Formula parity with /root/reference/xpysom_dask/decays.py:

* asymptotic:  ``v0 / (1 + 2t/T)``            (decays.py:4-20; ignores vN)
* exponential: ``v0 · exp(−t·k)`` with ``k = −ln(vN/v0)/T``; ``vN == 0``
  falls back to ``k = −ln(0.1)/T``            (decays.py:23-43)
* linear:      ``v0 + (vN−v0)·t/(T−1)``; T==1 → v0  (decays.py:46-65)
"""

from __future__ import annotations

from math import exp, log

__all__ = ["resolve_decay", "DECAY_NAMES", "asymptotic", "exponential", "linear"]


def asymptotic(v0: float, vN: float, t: int, T: int) -> float:
    return v0 / (1.0 + 2.0 * t / T)


def exponential(v0: float, vN: float, t: int, T: int) -> float:
    if vN == 0:
        rate = -log(0.1) / T
    else:
        rate = -log(vN / v0) / T
    return v0 * exp(-t * rate)


def linear(v0: float, vN: float, t: int, T: int) -> float:
    if T == 1:
        return v0
    return v0 + (vN - v0) * t / (T - 1)


_DECAYS = {
    "exponential": exponential,
    "asymptotic": asymptotic,
    "linear": linear,
}

DECAY_NAMES = tuple(_DECAYS)


def resolve_decay(name: str):
    """Registry lookup; ValueError on unknown name (parity: xpysom.py:211-222)."""
    if name not in _DECAYS:
        raise ValueError(
            "%s not supported. Functions available: %s" % (name, ", ".join(_DECAYS))
        )
    return _DECAYS[name]
