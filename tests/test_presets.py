"""Measured per-family knob presets (ramp_tpu/presets.py)."""
from ramp_tpu.presets import (DYNAMIC_PRESETS, PRESETS_3D, STATIC_PRESETS,
                              resolve_3d_preset, resolve_dynamic_preset,
                              resolve_static_preset)


def test_parity_is_empty():
    assert STATIC_PRESETS["parity"] == {}
    assert resolve_static_preset(None, None, None) == (None, None)
    assert resolve_static_preset("parity", None, None) == (None, None)


def test_presets_resolve():
    assert resolve_static_preset("quality", None, None) == (None, 5.0)
    assert resolve_static_preset("fast", None, None) == (3, 5.0)


def test_explicit_knobs_override_preset():
    assert resolve_static_preset("quality", 8, None) == (8, 5.0)
    assert resolve_static_preset("fast", None, 2.5) == (3, 2.5)


def test_dynamic_presets():
    assert DYNAMIC_PRESETS["parity"] == {}
    assert resolve_dynamic_preset(None, None) is None
    # the w=3.5 small-grid peak lost the 100x10 paper A/B (0.633 vs
    # 0.646), so dynamic quality resolves to parity settings
    assert resolve_dynamic_preset("quality", None) is None
    assert resolve_dynamic_preset("quality", 2.5) == 2.5


def test_3d_presets():
    assert PRESETS_3D["parity"] == {}
    assert resolve_3d_preset(None, None) == (False, None)
    assert resolve_3d_preset("quality", None) == (False, 4.0)
    assert resolve_3d_preset("quality", 5.75) == (False, 5.75)
    # fast = the measured DDIM-5 sampler at parity weight
    assert resolve_3d_preset("fast", None) == (True, None)
    assert resolve_3d_preset("fast", 4.0) == (True, 4.0)
    # an explicit --ddim flag forces the sampler on top of any preset
    assert resolve_3d_preset("parity", None, use_ddim=True) == (True, None)
