"""Aggregate confidence intervals (ramp_tpu/eval/stats.py)."""
import math

import pytest

from ramp_tpu.eval.stats import (ci_fields, cluster_means, mean_ci95,
                                 rate_ci95, wilson_ci)


def test_wilson_known_value():
    # 742 successes in 1000 (the static plain grid shape): Wilson 95% CI
    lo, hi = wilson_ci(742, 1000)
    assert 0.713 < lo < 0.715 and 0.768 < hi < 0.770
    assert lo < 0.742 < hi


def test_wilson_edges():
    assert wilson_ci(0, 0) is None
    lo, hi = wilson_ci(0, 20)
    assert lo == 0.0 and 0.0 < hi < 0.25
    lo, hi = wilson_ci(20, 20)
    assert hi == 1.0 and 0.75 < lo < 1.0


def test_mean_ci():
    assert mean_ci95([]) is None
    assert mean_ci95([0.5]) == (0.5, 0.5)
    lo, hi = mean_ci95([0.0, 0.5, 1.0, 1.0])
    m = 2.5 / 4
    assert lo < m < hi
    half = 1.959963984540054 * math.sqrt(
        sum((v - m) ** 2 for v in [0.0, 0.5, 1.0, 1.0]) / 3 / 4)
    assert abs((hi - lo) / 2 - half) < 1e-12


def test_mean_ci_bounds_clamp():
    # 3 clean runs + 1 capture: unclamped upper bound would be ~1.24
    lo, hi = mean_ci95([1.0, 1.0, 1.0, 0.0], bounds=(0.0, 1.0))
    assert hi == 1.0 and 0.0 <= lo < 0.75


def test_cluster_means():
    assert cluster_means([1, 0, 1, 1], 2) == [0.5, 1.0]
    assert cluster_means([1, 0, 1, 1], 1) == [1.0, 0.0, 1.0, 1.0]
    with pytest.raises(ValueError):
        cluster_means([1, 0, 1], 2)


def test_rate_ci_clustering_widens():
    # 100 episodes: 10 contexts x 10 perfectly correlated repeats (3
    # all-capture contexts). Treating episodes as independent (Wilson on
    # n=100) is ~3x too narrow vs clustering on the 10 contexts.
    outcomes = ([1.0] * 10 * 3) + ([0.0] * 10 * 7)
    assert rate_ci95(outcomes, cluster_size=1) == wilson_ci(30, 100)
    lo_w, hi_w = rate_ci95(outcomes, cluster_size=1)
    lo_c, hi_c = rate_ci95(outcomes, cluster_size=10)
    assert (hi_c - lo_c) > 1.8 * (hi_w - lo_w)
    assert lo_c < 0.3 < hi_c
    assert lo_c >= 0.0 and hi_c <= 1.0


def test_ci_fields():
    assert ci_fields("x", None) == {}
    assert ci_fields("x", (0.1234567, 0.9)) == {"x_ci95": [0.1235, 0.9]}
