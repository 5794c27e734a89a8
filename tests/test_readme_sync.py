"""README's perf table cannot drift from the committed captures (VERDICT
r4 weak #9): scripts/sync_readme_perf.py generates the block between the
perf-table markers from the newest BENCH capture + northstar JSONs, and
this test fails the suite whenever the committed README is stale."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_perf_table_is_current():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "sync_readme_perf.py"),
         "--check"],
        capture_output=True, text=True, timeout=60, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
