"""Umbrella CLI dispatch (`python -m ramp_tpu <command>`)."""
import subprocess
import sys

import pytest

REPO = __file__.rsplit("/tests/", 1)[0]


def run(*args):
    return subprocess.run([sys.executable, "-m", "ramp_tpu", *args],
                          capture_output=True, text=True, cwd=REPO,
                          timeout=120)


def test_help_lists_commands():
    r = run()
    assert r.returncode == 0
    for cmd in ("train", "static", "dynamic", "3d", "serve"):
        assert cmd in r.stdout


def test_unknown_command_rejected():
    r = run("nope")
    assert r.returncode == 2
    assert "unknown command" in r.stderr


def test_dispatch_reaches_script_argparse():
    r = run("generate-data", "--help")
    assert r.returncode == 0
    assert "--n-tasks" in r.stdout


def test_top_level_lazy_exports():
    import ramp_tpu

    assert "StaticPlanner" in dir(ramp_tpu)
    planner_cls = ramp_tpu.StaticPlanner
    assert planner_cls.__name__ == "StaticPlanner"
    assert ramp_tpu.STATIC_PRESETS["quality"] == {"ddim_steps": 4,
                                                  "cfg_weight": 5.0}
    try:
        ramp_tpu.NotAThing
        raise AssertionError("expected AttributeError")
    except AttributeError:
        pass
