"""tools/check_oracle.py CLI strictness: unknown query names must fail
loudly (exit 2 + message) instead of being silently skipped — a typo on
the CLI must never masquerade as a pass."""

import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _mod():
    sys.path.insert(0, TOOLS)
    try:
        import check_oracle
    finally:
        sys.path.remove(TOOLS)
    return check_oracle


def test_unknown_names_detected():
    m = _mod()
    assert m.unknown_names({"nope", "bm25_topk"}, {"bm25_topk": 1}) == ["nope"]
    assert m.unknown_names(set(), {"bm25_topk": 1}) == []
    assert m.unknown_names({"bm25_topk"}, {"bm25_topk": 1}) == []


def test_main_exits_nonzero_on_unknown_query(monkeypatch, capsys):
    m = _mod()
    monkeypatch.setattr(
        sys, "argv", ["check_oracle.py", "/tmp", "no_such_query_xyz"]
    )
    with pytest.raises(SystemExit) as exc:
        m.main()
    assert exc.value.code == 2
    assert "no such query" in capsys.readouterr().out
