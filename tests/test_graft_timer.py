"""The dryrun leg timer's soft budget fails loudly (VERDICT r4: 25 silent
serial legs outgrew the driver's clock and left an empty tail)."""

import sys

import pytest

import __graft_entry__ as g


def test_budget_violation_raises(monkeypatch, capsys):
    monkeypatch.setenv('NAFWEBSOD_DRYRUN_BUDGET_S', '0.0')
    t = g._LegTimer(n_legs=1)
    t.done('leg-a')
    with pytest.raises(RuntimeError, match='soft budget'):
        t.finish()
    out = capsys.readouterr().out
    assert '[leg 1/1] leg-a ok' in out


def test_skipped_leg_says_so(monkeypatch, capsys):
    """A guarded leg that does not execute must print SKIPPED, not a
    0.0s 'ok' that certifies something that never ran."""
    monkeypatch.setenv('NAFWEBSOD_DRYRUN_BUDGET_S', '3600')
    t = g._LegTimer(n_legs=2)
    t.done('leg-a')
    t.skip('pipeline', 'needs n_devices >= 2')
    t.finish()
    out = capsys.readouterr().out
    assert '[leg 2/2] pipeline SKIPPED (needs n_devices >= 2)' in out
    assert '1 legs in' in out  # skipped legs do not enter the summary


def test_within_budget_summarizes(monkeypatch, capsys):
    monkeypatch.setenv('NAFWEBSOD_DRYRUN_BUDGET_S', '3600')
    t = g._LegTimer(n_legs=2)
    t.done('leg-a')
    t.done('leg-b')
    t.finish()
    out = capsys.readouterr().out
    assert '2 legs in' in out and 'slowest:' in out
