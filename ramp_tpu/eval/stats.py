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


def mean_ci95(values: Sequence[float], z: float = _Z95,
              bounds: Optional[Tuple[float, float]] = None,
              ) -> Optional[Tuple[float, float]]:
    """Normal-approximation 95% interval on the mean of a bounded score.

    `bounds` clamps the interval to the score's range (e.g. (0, 1) for the
    dynamic 0/0.5/1 score) — without it a small sample of extreme scores
    can report an impossible CI like [0.26, 1.24].
    """
    vals = [float(v) for v in values]
    n = len(vals)
    if n == 0:
        return None
    mean = sum(vals) / n
    if n == 1:
        lo = hi = mean
    else:
        var = sum((v - mean) ** 2 for v in vals) / (n - 1)
        half = z * math.sqrt(var / n)
        lo, hi = mean - half, mean + half
    if bounds is not None:
        lo, hi = max(bounds[0], lo), min(bounds[1], hi)
    return (lo, hi)


def cluster_means(values: Sequence[float], cluster_size: int) -> List[float]:
    """Per-cluster means of consecutive chunks (contexts × experiments grids).

    Repeated episodes on the SAME context differ only in PRNG key and are
    strongly correlated, so the independent sampling unit for a CI is the
    context, not the episode. Callers collapse each context's episodes to
    one mean, then interval the means: n_contexts=100 × n_experiments=10
    yields n=100 (±~4.5% half-width on a rate), not a 3× too-narrow n=1000.
    """
    vals = [float(v) for v in values]
    if cluster_size <= 1:
        return vals
    if len(vals) % cluster_size:
        raise ValueError(
            f"{len(vals)} values do not split into clusters of {cluster_size}")
    return [sum(vals[i:i + cluster_size]) / cluster_size
            for i in range(0, len(vals), cluster_size)]


def rate_ci95(outcomes: Sequence[float], cluster_size: int = 1,
              z: float = _Z95) -> Optional[Tuple[float, float]]:
    """95% CI on a binary-outcome rate, clustering repeated trials.

    cluster_size == 1 (independent trials): Wilson score interval.
    cluster_size > 1: normal interval on the per-cluster rates, clamped to
    [0, 1] — Wilson's binomial model does not hold for correlated trials.
    """
    if cluster_size <= 1:
        vals = [float(v) for v in outcomes]
        return wilson_ci(int(round(sum(vals))), len(vals), z=z)
    return mean_ci95(cluster_means(outcomes, cluster_size), z=z,
                     bounds=(0.0, 1.0))


def ci_fields(prefix: str, ci: Optional[Tuple[float, float]]) -> dict:
    """`{prefix}_ci95: [lo, hi]` dict entry (empty when no data)."""
    if ci is None:
        return {}
    return {f"{prefix}_ci95": [round(ci[0], 4), round(ci[1], 4)]}
