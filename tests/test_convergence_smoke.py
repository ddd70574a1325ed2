"""End-to-end training-convergence smoke: drives
`scripts/train_convergence.py` (synthetic corpus -> binarize -> fs2 ->
warm-started shallow diffusion -> sample -> vocode) for a few hundred
steps and asserts every training signal moves the right way.

The full 2000-step run (the reference's train-it-and-listen recipe at
miniature scale, `doc/train.md:10-31`) is recorded in
artifacts/convergence/ and BASELINE.md; this test keeps the pipeline
honest in CI without the hour-long run.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_stage_training_improves(tmp_path):
    env = dict(
        os.environ,
        TC_STEPS="300",
        TC_ITEMS="16",
        TC_HIDDEN="32",
        TC_SMOKE="1",
        TC_OUT=str(tmp_path),
        TC_PLATFORM="cpu",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_convergence.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["converged"], summary
    # the artifacts the full run commits exist here too
    assert (tmp_path / "curves_fs2.json").exists()
    assert (tmp_path / "curves_diff.json").exists()
    assert summary.get("wav") and os.path.exists(summary["wav"])
