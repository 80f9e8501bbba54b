"""Static-analysis gate: no undefined names anywhere in the package.

Round 2 shipped a NameError (`VMEM_LIMIT_MB` referenced but never defined
in ops/pallas_stencil.py) that only surfaced when the Pallas path executed.
This test makes that bug class a suite failure even when no test executes
the offending line — the local equivalent of CI's `ruff --select F821`.
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_no_undefined_names():
    targets = ["dycoreplanet_tpu", "bench.py", "__graft_entry__.py",
               "scripts", "tests"]
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_undefined.py"),
         *targets],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_all_modules_compile():
    import compileall
    ok = compileall.compile_dir(str(REPO / "dycoreplanet_tpu"),
                                quiet=2, force=False)
    assert ok
