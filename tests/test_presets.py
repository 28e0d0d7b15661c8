"""Measured per-family knob presets (ramp_tpu/presets.py)."""
from ramp_tpu.presets import (DYNAMIC_PRESETS, PRESETS_3D, STATIC_PRESETS,
                              resolve_3d_preset, resolve_dynamic_preset,
                              resolve_static_preset)


def test_parity_is_empty():
    assert STATIC_PRESETS["parity"] == {}
    assert resolve_static_preset(None, None, None) == (None, None)
    assert resolve_static_preset("parity", None, None) == (None, None)


def test_presets_resolve():
    # quality = DDIM-4/w=5, the best measured full-grid success (0.871,
    # eval_results_static_d4w5.json)
    assert resolve_static_preset("quality", None, None) == (4, 5.0)
    assert resolve_static_preset("fast", None, None) == (3, 5.0)


def test_explicit_knobs_override_preset():
    assert resolve_static_preset("quality", 8, None) == (8, 5.0)
    assert resolve_static_preset("fast", None, 2.5) == (3, 2.5)


def test_dynamic_presets():
    assert DYNAMIC_PRESETS["parity"] == {}
    assert resolve_dynamic_preset(None, None) == (None, None)
    # the w=3.5 small-grid peak lost the 100x10 paper A/B (0.633 vs
    # 0.646), so dynamic quality resolves to parity settings
    assert resolve_dynamic_preset("quality", None) == (None, None)
    assert resolve_dynamic_preset("quality", 2.5) == (2.5, None)
    # fast = 3 STAGE-II refine steps: paper-scale 0.654 ~ parity 0.646
    # (CIs overlap) at -25% p50 (eval_results_dynamic_paper_l3.json)
    assert resolve_dynamic_preset("fast", None) == (None, 3)
    # explicit knobs win over the preset
    assert resolve_dynamic_preset("fast", 3.0, 5) == (3.0, 5)


def test_3d_presets():
    assert PRESETS_3D["parity"] == {}
    assert resolve_3d_preset(None, None) == (False, None, None)
    assert resolve_3d_preset("quality", None) == (False, None, 4.0)
    assert resolve_3d_preset("quality", 5.75) == (False, None, 5.75)
    # fast = DDIM-8 at parity weight (the post-fix bracket winner,
    # eval_results_3d_grid_ddim8.json: 0.95 / 1.51% / -9% latency)
    assert resolve_3d_preset("fast", None) == (True, 8, None)
    assert resolve_3d_preset("fast", 4.0) == (True, 8, 4.0)
    # an explicit --ddim flag forces the sampler on top of any preset
    assert resolve_3d_preset("parity", None, use_ddim=True) == (True, None,
                                                                None)


def test_3d_fast_preset_falls_back_to_ddpm_under_compose():
    # DDIM composition measured 0.55 success vs 0.75 for DDPM
    # (eval_results_3d_grid_compose_ddim.json) — the preset must not
    # silently apply the sampler swap to compose runs
    assert resolve_3d_preset("fast", None, compose=True) == (False, None,
                                                             None)
    # but an explicit user --ddim is still honored under compose
    assert resolve_3d_preset("fast", None, use_ddim=True,
                             compose=True) == (True, None, None)
