"""Platform utilities: accelerator availability probe + bench fallback.

The TPU on this machine sits behind a TCP relay; when the relay dies,
``jax.devices()`` blocks forever instead of raising. These tests pin the
non-hanging contract of the probe used by bench.py's driver entrypoint.
"""
import os

from ramp_tpu.utils import platform as plat


def test_accelerator_available_cpu_env_is_instant(monkeypatch):
    # conftest forces JAX_PLATFORMS=cpu; the probe must short-circuit
    # without spawning a subprocess (a subprocess probe costs seconds).
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    monkeypatch.setattr(plat.subprocess, "run",
                        lambda *a, **k: calls.append(a))
    assert plat.accelerator_available() is True
    assert not calls


def test_accelerator_unavailable_when_relay_dead(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(plat, "_relay_listening", lambda **k: False)
    calls = []
    monkeypatch.setattr(plat.subprocess, "run",
                        lambda *a, **k: calls.append(a))
    assert plat.accelerator_available() is False
    assert not calls  # fast-fail: no subprocess probe when no relay listens


def test_accelerator_probe_timeout_means_unavailable(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(plat, "_relay_listening", lambda **k: True)

    def fake_run(*a, **k):
        raise plat.subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(plat.subprocess, "run", fake_run)
    assert plat.accelerator_available() is False


def test_wait_for_accelerator_bounded(monkeypatch):
    monkeypatch.setattr(plat, "accelerator_available", lambda: False)
    t0 = plat.time.monotonic()
    assert plat.wait_for_accelerator(max_wait_s=0.2, poll_s=0.05) is False
    assert plat.time.monotonic() - t0 < 5.0

    monkeypatch.setattr(plat, "accelerator_available", lambda: True)
    assert plat.wait_for_accelerator(max_wait_s=0.0) is True


def test_relay_listening_returns_bool():
    assert plat._relay_listening(timeout_s=0.2) in (True, False)


def test_bench_fallback_config_constructs():
    # The tiny CPU-fallback config in bench.main must stay constructible as
    # planner config fields evolve.
    from ramp_tpu.planners.static import StaticPlannerConfig
    cfg = StaticPlannerConfig(use_apf=True, horizon=16, n_diffusion_steps=10,
                              unet_input_dim=8, unet_dim_mults_option=0,
                              dtype="float32")
    assert cfg.ddim_steps == 5
