"""Measured inference presets for the static planner.

The reference ships exactly one configuration (DDIM-5, CFG w=2,
`diffusion_model_static.py:40,164`). Sweeping the traced guidance knobs on
the same trained weights (24 scenes x 10 contexts x 20 samples,
`scripts/static_probe_ab.sh`; CPU-proxy numbers below, chip rerun queued)
moves plain success substantially with zero retraining:

    parity   DDIM-5, w=2   success 0.733   (the reference configuration)
    quality  DDIM-5, w=5   success 0.858   (same latency; plateau — w=6 equal)
    fast     DDIM-3, w=3   success 0.846   (~40% lower replan latency)

More steps at fixed weight HURT the any-of-N success metric (population
diversity collapses); a stronger CFG push raises success and diversity
together until it plateaus at w=5. Explicit --ddim-steps/--cfg-weight
always override a preset.
"""
from __future__ import annotations

from typing import Optional, Tuple

STATIC_PRESETS = {
    "parity": {},
    "quality": {"cfg_weight": 5.0},
    "fast": {"ddim_steps": 3, "cfg_weight": 3.0},
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
