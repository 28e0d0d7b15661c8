"""Static-planner knob presets (measured in scripts/static_probe_ab.sh)."""
from ramp_tpu.presets import STATIC_PRESETS, resolve_static_preset


def test_parity_is_empty():
    assert STATIC_PRESETS["parity"] == {}
    assert resolve_static_preset(None, None, None) == (None, None)
    assert resolve_static_preset("parity", None, None) == (None, None)


def test_presets_resolve():
    assert resolve_static_preset("quality", None, None) == (None, 5.0)
    assert resolve_static_preset("fast", None, None) == (3, 3.0)


def test_explicit_knobs_override_preset():
    assert resolve_static_preset("quality", 8, None) == (8, 5.0)
    assert resolve_static_preset("fast", None, 2.5) == (3, 2.5)
