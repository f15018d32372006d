"""The smoke-tier wall budget actually fails a session (VERDICT r4: the
tier's budget rotted because nothing enforced it). Pins the
pytest_sessionfinish exitstatus mechanism against pytest upgrades."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_smoke_subset(budget):
    env = dict(os.environ)
    env['NAFWEBSOD_SMOKE_BUDGET_S'] = budget
    return subprocess.run(
        [sys.executable, '-m', 'pytest', 'tests/test_config.py',
         '-m', 'smoke', '-q', '--no-header', '-p', 'no:cacheprovider'],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env)


def test_exceeded_budget_fails_passing_session():
    proc = _run_smoke_subset(budget='0.001')
    assert 'SMOKE BUDGET EXCEEDED' in proc.stdout, proc.stdout[-2000:]
    assert proc.returncode == 1, proc.stdout[-2000:]
    # the tests themselves passed; only the budget flipped the session
    assert ' passed' in proc.stdout and 'failed' not in proc.stdout


def test_within_budget_passes():
    proc = _run_smoke_subset(budget='100000')
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert 'SMOKE BUDGET EXCEEDED' not in proc.stdout
