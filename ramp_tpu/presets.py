"""Measured inference presets for all three planner families.

The reference ships exactly one configuration per family (static DDIM-5
w=2 `diffusion_model_static.py:40,164`; dynamic DDIM 10+5 w=2.5
`diffusion_model_dynamic.py`; 3-D DDPM w=5.75 `inference3d.py`).
Sweeping the traced guidance knobs on the same trained weights
(`scripts/static_probe_ab.sh`, `scripts/dynamic_probe_ab.sh`, 3-D grid
evals) moves quality substantially with zero retraining.  All rows
below are REAL-CHIP numbers; preset-deciding rows are full paper-scale
grids (small probe grids repeatedly misled — see the dynamic w=3.5 and
3-D DDIM-5 post-mortems in RESULTS.md):

    PRESETS ARE PER-WEIGHTS (round-3 finding): the static rows below
    were swept on the 96-scene `simple2d_v2` weights, where strong CFG
    compensates for an under-data'd model (+12.9 points).  On the
    flagship `simple2d_v4_300k` (768 scenes, 300k steps) the SAME knobs
    LOSE: parity 0.985 vs d4w5 0.979 (+2.5 collision points,
    `eval_results_static_v4_300k{,_d4w5}.json`) — for those weights use
    parity sampling (no --preset).  Re-sweep before trusting a preset
    on new weights.

    static  (full 96 scenes x 20 contexts x 20 samples, plain success,
             simple2d_v2 weights)
      parity   DDIM-5, w=2   0.742   (the reference configuration,
                                      `eval_results_static.json`)
      quality  DDIM-4, w=5   0.871   (best measured full-grid success;
                                      collision 11.3 / path 1.81 — near
                                      parity-tight — at p50 38.4 ms,
                                      `eval_results_static_d4w5.json`.
                                      Demotes DDIM-5/w=5, whose 24x10
                                      probe scored 0.842 at the same
                                      latency.)
      fast     DDIM-3, w=5   0.8495  (lowest p50 — 34 ms probe / 37.7 ms
                                      full grid — but a looser
                                      population: collision 13.98, path
                                      2.62, `eval_results_static_tuned
                                      .json`.  Prefer quality unless the
                                      last ~2 ms matter.)

    dynamic (closed-loop score)
      parity   w=2.5   0.646   (100x10 paper grid on chip, CI .560-.732)
      quality  = parity        (w=3.5 peaked on every SMALL grid — 0.80
                                CPU proxy, 0.775 chip 20x2 — but at paper
                                scale scores 0.633 [.547-.719], inside
                                parity's CI and numerically below it, so
                                the bump is small-grid noise; quality is
                                parity until a knob shows a real gain at
                                1000 episodes)
      fast     3 refine steps  0.654 at paper scale (CI .624-.683 vs
                                parity .616-.675 — indistinguishable
                                quality) at p50 24 vs 32 ms (-25%): two
                                fewer U-Net calls per replan, a mechanical
                                latency win that survives 1000 episodes
                                (`eval_results_dynamic_paper_l3.json`)

    3d      (12 scenes x 5 contexts x 4 samples, success)
      parity   DDPM-25, w=5.75  0.917 / 1.04% coll / path 1.44 / 39.1ms
      quality  DDPM-25, w=4     0.933 / 1.02% (vs 0.917 parity on chip;
                                on the harder compose grid w=4 ties
                                parity success and edges collision)
      fast     DDIM-8           0.950 / 1.51% / path 1.59 / 35.7ms
                                (`eval_results_3d_grid_ddim8.json`) —
                                higher success than parity at -9%
                                latency with 3x fewer U-Net calls.
                                NON-COMPOSE ONLY: under composition DDIM
                                collapses to 0.55 success / 5.9% coll
                                (`eval_results_3d_grid_compose_ddim
                                .json`), so the preset falls back to the
                                DDPM chain when compose=True.

    History: the original 3-D fast pick (DDIM-5 "1.000 success / 0.00%
    collision") was a metric-gaming artifact of an unclipped x0-hat
    under the exponential schedule — trajectories saturated at the
    domain boundary where there are no interior obstacles.  Commit
    c337d01 fixed the chain (clip x0-hat, invalidate boundary-saturated
    waypoints); honest post-fix numbers are DDIM-5 0.95 / 2.14% / path
    9.34, DDIM-8 0.95 / 1.51% / 1.59, DDIM-12 0.917 / 1.40% / 1.47 —
    DDIM-8 is the only bracket point beating parity on success with a
    sane path length.

More steps at fixed weight HURT the any-of-N success metric (population
diversity collapses); a stronger CFG push raises success and diversity
together until it plateaus. Explicit knob flags always override a preset.
"""
from __future__ import annotations

from typing import Optional, Tuple

STATIC_PRESETS = {
    "parity": {},
    # full-grid 0.871 (eval_results_static_d4w5.json) vs the previous
    # quality pick DDIM-5/w=5 (0.842 on the 24x10 probe, same latency).
    "quality": {"ddim_steps": 4, "cfg_weight": 5.0},
    "fast": {"ddim_steps": 3, "cfg_weight": 5.0},
}

DYNAMIC_PRESETS = {
    "parity": {},
    # w=3.5 won every small probe grid but lost the 100x10 paper-scale
    # A/B (0.633 vs 0.646, eval_results_dynamic_paper{_quality,}.json);
    # no dynamic knob has a measured paper-scale QUALITY gain, so
    # quality=parity.
    "quality": {},
    # 3 STAGE-II refine steps: paper-scale score 0.654 (ties parity's
    # 0.646 within CI) at -25% p50 (eval_results_dynamic_paper_l3.json).
    "fast": {"ddim_steps_low": 3},
}

PRESETS_3D = {
    "parity": {},
    "quality": {"cfg_weight": 4.0},
    # DDIM-8 at parity weight: success 0.950 vs 0.917, -9% latency, 3x
    # fewer U-Net calls (eval_results_3d_grid_ddim8.json vs
    # eval_results_3d_grid.json).  Compose is excluded: DDIM composition
    # scored 0.55 (eval_results_3d_grid_compose_ddim.json), so
    # resolve_3d_preset drops the sampler swap when compose=True.
    "fast": {"ddim": True, "ddim_steps": 8},
}


def resolve_static_preset(preset: Optional[str],
                          ddim_steps: Optional[int],
                          cfg_weight: Optional[float]
                          ) -> Tuple[Optional[int], Optional[float]]:
    """Merge a preset with explicit knob overrides (explicit wins)."""
    table = STATIC_PRESETS[preset or "parity"]
    if ddim_steps is None:
        ddim_steps = table.get("ddim_steps")
    if cfg_weight is None:
        cfg_weight = table.get("cfg_weight")
    return ddim_steps, cfg_weight


def resolve_dynamic_preset(preset: Optional[str],
                           cfg_weight: Optional[float],
                           ddim_steps_low: Optional[int] = None
                           ) -> Tuple[Optional[float], Optional[int]]:
    """(CFG weight, STAGE-II refine steps) for the dynamic planner
    (explicit flags win)."""
    table = DYNAMIC_PRESETS[preset or "parity"]
    if cfg_weight is None:
        cfg_weight = table.get("cfg_weight")
    if ddim_steps_low is None:
        ddim_steps_low = table.get("ddim_steps_low")
    return cfg_weight, ddim_steps_low


def resolve_3d_preset(preset: Optional[str], cfg_weight: Optional[float],
                      use_ddim: bool = False, compose: bool = False
                      ) -> Tuple[bool, Optional[int], Optional[float]]:
    """(use_ddim, ddim_steps, CFG / composition weight) for the 3-D planner.

    Explicit knobs win: a user-passed `--cfg-weight` overrides the preset
    weight, and `--ddim` forces the DDIM sampler on top of any preset.
    A preset-driven DDIM (the `fast` preset) is dropped under composition
    — measured 0.55 success vs 0.75 for the DDPM chain
    (`eval_results_3d_grid_compose_ddim.json`) — but an explicit `--ddim`
    is honored even there (the user asked for it)."""
    table = PRESETS_3D[preset or "parity"]
    if cfg_weight is None:
        cfg_weight = table.get("cfg_weight")
    preset_ddim = bool(table.get("ddim", False)) and not compose
    ddim_steps = table.get("ddim_steps") if preset_ddim else None
    return use_ddim or preset_ddim, ddim_steps, cfg_weight
