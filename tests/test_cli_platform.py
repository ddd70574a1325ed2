"""`JAX_PLATFORMS=cpu python -m bisinger_tpu.run ...` must actually run
on CPU.

A sitecustomize that registers an out-of-tree jax backend (the axon TPU
plugin in this image) can force its platform via jax.config at
interpreter start — AFTER jax read the env var — which silently sent
documented "CPU" CLI runs through the TPU tunnel (60s+ compiles per
program). `run._honor_jax_platforms_env` restores env-var precedence at
CLI entry."""

import os
import subprocess
import sys


def test_cli_honors_jax_platforms_env():
    # run in a fresh interpreter with the real (possibly
    # backend-forcing) sitecustomize active — NOT under the test
    # conftest's already-pinned cpu config
    code = (
        "from bisinger_tpu.run import _honor_jax_platforms_env\n"
        "_honor_jax_platforms_env()\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "print('backend ok')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "backend ok" in out.stdout
