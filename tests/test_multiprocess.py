"""Real multi-process runtime test (VERDICT r2 #3).

Launches 2 ACTUAL processes (subprocesses with a localhost coordinator,
CPU backend, 2 virtual devices each) through the production bootstrap +
Trainer via tools/multiprocess_proof.py, and asserts the launcher's
verdict: identical params/EMA/optimizer state on every process after
training, process-sharded loader, rank-0-gated logging, collective
checkpoint.  This is the jax.distributed path the reference exercises with
every `torchrun` run (/root/reference/trainer.py:49-64) and the virtual
8-device mesh tests cannot cover (they are one process).
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_two_process_training_converges_identically(tmp_path):
    out = tmp_path / "mp"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multiprocess_proof.py"),
         "--out", str(out), "--nproc", "2", "--iters", "3", "--batch", "4",
         "--timeout", "1500"],
        capture_output=True, text=True, timeout=1700)
    assert r.returncode == 0, f"launcher failed:\n{r.stdout}\n{r.stderr}"
    report = json.loads((out / "report.json").read_text())
    assert report["ok"]
    assert report["params_identical"] and report["ema_identical"]
    assert report["opt_identical"]
    assert report["loader_sharded"]
    assert report["global_devices"] == 4  # 2 processes x 2 devices
    assert report["rank0_log_only"] and report["checkpoint_written"]
