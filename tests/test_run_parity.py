"""The parity runbook's self-contained stage runs in CI (VERDICT r4 item 5).

``tools/run_parity.py --stage goldens`` is the stage that needs NO real
data (random-init weights, oracle tolerances) — running it here means the
runbook itself cannot rot before the day a caffemodel + flickr_voc rig
exists: a regression in the driver, the oracle transcription, or the
model path fails this test, not a future parity attempt."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_goldens_stage_self_contained(tmp_path):
    env = dict(os.environ)
    env['NAFWEBSOD_PLATFORM'] = 'cpu'  # never touch the tunnel chip from CI
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'run_parity.py'),
         '--stage', 'goldens',
         '--hidden-dim', '64',
         '--probe-size', '32', '48',
         '--weights', str(tmp_path / 'missing.pkl'),  # random-init ladder
         '--workdir', str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert 'ALL STAGES PASS' in proc.stdout
    # every rung of the tolerance ladder actually ran and passed
    for rung in ('checkpoint round-trip', 'conv body', 'RoIPoolF',
                 'fc towers (clean)', 'per-roi class scores',
                 'spatial-entropy weights', 'weighted CE loss'):
        assert any(rung in ln and 'PASS' in ln
                   for ln in proc.stdout.splitlines()), (
            rung + ' rung missing/failed:\n' + proc.stdout)
