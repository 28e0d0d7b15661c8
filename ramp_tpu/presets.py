"""Measured inference presets for all three planner families.

The reference ships exactly one configuration per family (static DDIM-5
w=2 `diffusion_model_static.py:40,164`; dynamic DDIM 10+5 w=2.5
`diffusion_model_dynamic.py`; 3-D DDPM w=5.75 `inference3d.py`).
Sweeping the traced guidance knobs on the same trained weights
(`scripts/static_probe_ab.sh`, `scripts/dynamic_probe_ab.sh`, 3-D grid
evals) moves quality substantially with zero retraining.  All rows
below are REAL-CHIP numbers (2026-08-19 probe tables `eval_ab_*.json`
/ `eval_dynab_*.json`, paper-scale grids `eval_results_*_paper*.json`,
3-D grids `eval_results_3d_grid*.json`):

    static  (24 scenes x 10 contexts x 20 samples, plain success, chip)
      parity   DDIM-5, w=2   0.721   (the reference configuration, 46ms)
      quality  DDIM-5, w=5   0.842   (reference-tight paths: collision
                                      10.4 / path 1.74 vs parity 10.6 /
                                      1.61; plateau — w=6 equal, 39ms)
      fast     DDIM-3, w=5   0.858   (highest success AND lowest p50,
                                      34ms, but population is looser:
                                      collision 13.98, path 2.62; full
                                      96x20 grid confirms 0.8495,
                                      `eval_results_static_tuned.json`)

    dynamic (closed-loop score)
      parity   w=2.5   0.646   (100x10 paper grid on chip, CI .560-.732)
      quality  = parity        (w=3.5 peaked on every SMALL grid — 0.80
                                CPU proxy, 0.775 chip 20x2 — but at paper
                                scale scores 0.633 [.547-.719], inside
                                parity's CI and numerically below it, so
                                the bump is small-grid noise; quality is
                                parity until a knob shows a real gain at
                                1000 episodes)

    3d      (12 scenes x 5 contexts x 4 samples, success)
      parity   w=5.75  0.917
      quality  w=4     0.933   (vs 0.917 parity on chip; on the harder
                                compose grid w=4 ties parity success and
                                edges collision, 3.52% vs 3.54% — the CPU
                                proxy's 0.767 compose win did not transfer)
      fast     DDIM-5  1.000   (the reference's dormant ddim=True path,
                                parity weight: 0% collision and p50 32.4
                                vs 39.1 ms — dominates DDPM-25 on every
                                metric with 5x fewer U-Net calls)

More steps at fixed weight HURT the any-of-N success metric (population
diversity collapses); a stronger CFG push raises success and diversity
together until it plateaus. Explicit knob flags always override a preset.
"""
from __future__ import annotations

from typing import Optional, Tuple

STATIC_PRESETS = {
    "parity": {},
    "quality": {"cfg_weight": 5.0},
    "fast": {"ddim_steps": 3, "cfg_weight": 5.0},
}

DYNAMIC_PRESETS = {
    "parity": {},
    # w=3.5 won every small probe grid but lost the 100x10 paper-scale
    # A/B (0.633 vs 0.646, eval_results_dynamic_paper{_quality,}.json);
    # no dynamic knob has a measured paper-scale gain, so quality=parity.
    "quality": {},
}

PRESETS_3D = {
    "parity": {},
    "quality": {"cfg_weight": 4.0},
    # the reference's dormant DDIM path dominates its shipped DDPM-25 on
    # the 12x5 chip grid: success 1.000 vs 0.917, collision 0.00% vs
    # 1.04%, p50 32.4 vs 39.1 ms with 5x fewer U-Net calls per plan
    # (eval_results_3d_grid_ddim.json vs eval_results_3d_grid.json).
    "fast": {"ddim": True},
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
                           cfg_weight: Optional[float]) -> Optional[float]:
    """CFG weight for the dynamic planner (explicit flag wins)."""
    table = DYNAMIC_PRESETS[preset or "parity"]
    return cfg_weight if cfg_weight is not None else table.get("cfg_weight")


def resolve_3d_preset(preset: Optional[str], cfg_weight: Optional[float],
                      use_ddim: bool = False
                      ) -> Tuple[bool, Optional[float]]:
    """(use_ddim, CFG / composition weight) for the 3-D planner.

    Explicit knobs win: a user-passed `--cfg-weight` overrides the preset
    weight, and `--ddim` forces the DDIM sampler on top of any preset."""
    table = PRESETS_3D[preset or "parity"]
    if cfg_weight is None:
        cfg_weight = table.get("cfg_weight")
    return use_ddim or bool(table.get("ddim", False)), cfg_weight
