"""bench_suite CLI plumbing test (tiny FFA config on CPU).

The uformer modes hardcode the flagship geometry (too heavy for a unit
test); the FFA modes exercise the shared argument/result plumbing, the
native fwd_whole path, and the FFA train-step mode end-to-end.
"""

import json
import os
import subprocess
import sys


def test_bench_suite_ffa_modes():
    cmd = [sys.executable, "-m", "dehaze_tpu.cli.bench_suite",
           "--arch", "ffa", "--ffa_blocks", "1", "--ffa_crop", "16",
           "--train_batches", "2", "--whole_hw", "24x40",
           "--whole_batch", "2", "--modes", "fwd_whole,train"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=560,
                       env={**os.environ, "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": repo})
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(line) for line in r.stdout.splitlines()
            if line.startswith("{")]
    modes = {row["mode"] for row in rows}
    assert modes == {"fwd_whole", "ffa_train_step_b2"}, modes
    whole = next(row for row in rows if row["mode"] == "fwd_whole")
    assert whole["canvas"] == "native" and whole["mpix_s"] > 0
    assert whole["batch"] == 2
    train = next(row for row in rows if row["mode"] == "ffa_train_step_b2")
    assert train["img_s"] > 0 and train["crop"] == 16
