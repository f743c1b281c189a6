"""Bounded runs of the differential/crash-resume fuzz harnesses in tools/
(the long campaigns are run out-of-band; results in ROUND_NOTES.md)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, seconds, seed):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["FUZZ_SEED"] = str(seed)
    env["FUZZ_MAX_ITERS"] = "6"    # bounded: the long campaigns run out-of-band
    env["FUZZ_NO_MESH"] = "1"      # mesh compiles dominate a fresh process
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), str(seconds)],
        capture_output=True, text=True, timeout=240, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "no failures" in proc.stdout, proc.stdout[-2000:]


def test_fuzz_differential_smoke():
    _run("fuzz_differential.py", 12, seed=1)


def test_fuzz_crash_resume_smoke():
    _run("fuzz_crash_resume.py", 12, seed=2)


# tools/fuzz_xray.py has no smoke twin: each fresh config compiles new jit
# programs (~1-2 min in a cold subprocess), far past a unit-test budget.
# It runs out-of-band; campaign results live in ROUND_NOTES.md.
