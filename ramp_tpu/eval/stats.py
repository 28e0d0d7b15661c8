"""Confidence intervals for eval aggregates.

SURVEY.md §7 hard-part 4: torch-vs-jax RNG means parity between engines is
statistical, not bitwise — success rates must carry interval estimates to be
comparable. The reference reports point estimates only
(`inference_static.py:319-342`); every aggregate here adds a 95% CI.

  * binary outcomes (success, capture, goal-reached): Wilson score interval
    — behaves correctly near 0/1 and for small n, unlike the Wald interval.
  * bounded scores (dynamic 0/0.5/1 score): normal approximation on the
    mean with the sample standard error.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

_Z95 = 1.959963984540054


def wilson_ci(n_success: int, n_total: int,
              z: float = _Z95) -> Optional[Tuple[float, float]]:
    """Wilson score 95% interval for a binomial proportion."""
    if n_total <= 0:
        return None
    p = n_success / n_total
    denom = 1.0 + z * z / n_total
    center = (p + z * z / (2 * n_total)) / denom
    half = (z / denom) * math.sqrt(
        p * (1 - p) / n_total + z * z / (4 * n_total * n_total))
    return (max(0.0, center - half), min(1.0, center + half))


def mean_ci95(values: Sequence[float],
              z: float = _Z95) -> Optional[Tuple[float, float]]:
    """Normal-approximation 95% interval on the mean of a bounded score."""
    vals = [float(v) for v in values]
    n = len(vals)
    if n == 0:
        return None
    mean = sum(vals) / n
    if n == 1:
        return (mean, mean)
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    half = z * math.sqrt(var / n)
    return (mean - half, mean + half)


def ci_fields(prefix: str, ci: Optional[Tuple[float, float]]) -> dict:
    """`{prefix}_ci95: [lo, hi]` dict entry (empty when no data)."""
    if ci is None:
        return {}
    return {f"{prefix}_ci95": [round(ci[0], 4), round(ci[1], 4)]}
