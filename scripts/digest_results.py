#!/usr/bin/env python
"""Print markdown-ready summary rows for eval-result JSONs.

  python scripts/digest_results.py eval_results_*.json

Handles the three JSON shapes in this repo (static harness aggregate,
dynamic harness aggregate, 3-D grid aggregate) and prints one line per
file: the numbers RESULTS.md tables need, nothing else.
"""
import json
import sys


def fmt(v, nd=3):
    return "—" if v is None else f"{v:.{nd}f}"


def main():
    for path in sys.argv[1:]:
        try:
            d = json.load(open(path))
        except Exception as e:
            print(f"{path}: UNREADABLE ({e})")
            continue
        a = d.get("aggregate", d)
        if "score" in a:  # dynamic
            ci95 = a.get("score_ci95")
            ci = (f" [{fmt(ci95[0])}–{fmt(ci95[1])}]"
                  if isinstance(ci95, (list, tuple)) else "")
            print(f"{path}: score {fmt(a['score'])}{ci} | goal "
                  f"{fmt(a.get('goal_success_rate'))} | capture "
                  f"{fmt(a.get('capture_rate'))} | path "
                  f"{fmt(a.get('path_length_mean'),2)} | p50/replan "
                  f"{fmt((a.get('t_per_replan_p50_s') or 0)*1e3,1)} ms")
        elif "success_rate" in a:  # static
            lo = a.get("success_rate_ci_low"); hi = a.get("success_rate_ci_high")
            ci = f" [{fmt(lo)}–{fmt(hi)}]" if lo is not None else ""
            print(f"{path}: success {fmt(a['success_rate'])}{ci} | collision "
                  f"{fmt(a.get('collision_intensity'),2)}% | path "
                  f"{fmt(a.get('path_length_mean'),2)} | wv "
                  f"{fmt(a.get('waypoint_variance_mean'),2)} | wander "
                  f"{a.get('n_wander_trajectories', '—')} | p50 "
                  f"{fmt((a.get('t_sampling_p50_s') or 0)*1e3,1)} ms")
        elif "success" in a:  # 3-D grid
            lo = a.get("success_ci_low"); hi = a.get("success_ci_high")
            ci = f" [{fmt(lo)}–{fmt(hi)}]" if lo is not None else ""
            print(f"{path}: success {fmt(a['success'])}{ci} | collision "
                  f"{fmt(a.get('collision_intensity_pct'),2)}% | path "
                  f"{fmt(a.get('path_length_mean'),2)} | free "
                  f"{a.get('n_free_trajectories','—')} | wander "
                  f"{a.get('n_wander_trajectories','—')} | p50 "
                  f"{fmt((a.get('t_sampling_p50_s') or 0)*1e3,1)} ms")
        else:
            print(f"{path}: keys {sorted(a)[:8]}")


if __name__ == "__main__":
    main()
