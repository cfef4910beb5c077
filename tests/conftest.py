"""Test env: CPU backend with 8 virtual devices (multi-chip simulation).

The TPU-world substitute for multi-node testing without a cluster
(SURVEY.md §4): XLA_FLAGS=--xla_force_host_platform_device_count=8.

This environment force-registers a remote TPU backend ('axon') for every
Python process via a sitecustomize on PYTHONPATH, initializing PJRT before
conftest runs — env tweaks here would be too late. So if we detect that
situation, re-exec pytest once with the axon path stripped and CPU forced;
the suite then runs on the fast local CPU backend with exact f32 matmuls.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# XLA:CPU collectives rendezvous with a 40 s termination timeout; this host
# exposes ONE core, so 8-virtual-device executions serialize and can
# legitimately take longer. Raise the timeout (the flag names come from
# xla_cpu DebugOptions).
_COLLECTIVE_FLAGS = (
    " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
)


def _needs_reexec() -> bool:
    if os.environ.get("DEHAZE_TPU_TEST_REEXEC"):
        return False
    if os.environ.get("DEHAZE_TPU_TEST_ON_TPU"):  # opt-in: run tests on TPU
        return False
    pythonpath = os.environ.get("PYTHONPATH", "")
    return ".axon_site" in pythonpath or os.environ.get("JAX_PLATFORMS") == "axon"


def _reexec_cpu() -> None:
    env = dict(os.environ)
    env["DEHAZE_TPU_TEST_REEXEC"] = "1"
    env["PYTHONPATH"] = _REPO
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    if "collective_call_terminate" not in flags:
        flags += _COLLECTIVE_FLAGS
    env["XLA_FLAGS"] = flags.strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


if _needs_reexec():
    # Re-exec from pytest_configure, NOT here: at conftest-import time
    # pytest's capture plugin has already pointed fd 1/2 at a private
    # tmpfile, so an execve now inherits those fds and the whole run's
    # output silently disappears (rc still propagates). At configure
    # time the CaptureManager is reachable and can restore the real
    # stdout/stderr first.
    def pytest_configure(config):
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.suspend_global_capture(in_=True)
        _reexec_cpu()

else:
    def pytest_configure(config):
        config.addinivalue_line(
            "markers",
            "slow: multi-minute tests (full-geometry parity oracles); "
            "deselect with -m 'not slow'")

import pytest


@pytest.fixture(scope="session")
def tiny_uformer(tmp_path_factory):
    """(ckpt_path, model, variables, key): the 32²/embed-8 f32 tiny Uformer
    + saved checkpoint shared by the CLI-level test files."""
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer
    from dehaze_tpu.train.checkpoint import save_checkpoint

    model = Uformer(ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32,
                                drop_path_rate=0.0))
    k = jax.random.PRNGKey(0)
    v = jax.jit(lambda: model.init({"params": k, "sample": k},
                                   jnp.zeros((1, 32, 32, 3))))()
    path = str(tmp_path_factory.mktemp("tiny_uformer") / "w.msgpack")
    save_checkpoint(path, 0, v["params"])
    return path, model, v, k


@pytest.fixture(scope="session")
def cli_run():
    """Run `python -m <module> ...` as a subprocess on the CPU backend and
    return stdout (asserting rc == 0). Shared CLI-drive helper."""
    import subprocess
    import sys

    def run(args, timeout=560):
        r = subprocess.run(
            [sys.executable, "-m"] + args, capture_output=True, text=True,
            timeout=timeout,
            env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": _REPO})
        assert r.returncode == 0, (args[0], r.stderr[-2000:])
        return r.stdout

    return run


if not _needs_reexec():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    if "collective_call_terminate" not in flags:
        flags += _COLLECTIVE_FLAGS
    os.environ["XLA_FLAGS"] = flags.strip()

    sys.path.insert(0, _REPO)

    import jax

    # Parity tests compare against NumPy: make f32 matmuls exact. (The
    # model's hot path uses bf16 activations regardless of this default.)
    jax.config.update("jax_default_matmul_precision", "highest")

    import dehaze_tpu  # noqa: F401  (persistent compilation cache)
