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


def test_within_budget_summarizes(monkeypatch, capsys):
    monkeypatch.setenv('NAFWEBSOD_DRYRUN_BUDGET_S', '3600')
    t = g._LegTimer(n_legs=2)
    t.done('leg-a')
    t.done('leg-b')
    t.finish()
    out = capsys.readouterr().out
    assert '2 legs in' in out and 'slowest:' in out
