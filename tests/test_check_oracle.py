"""Guard the guard: the local oracle comparator must actually detect
mismatches (a vacuous-pass bug here would make every local gate green)."""

from __future__ import annotations

import datetime
import decimal
import math
import sys

sys.path.insert(0, "/root/repo")

from tools.check_oracle import canon, rows_to_multiset  # noqa: E402


def test_canon_floats_and_specials():
    assert canon(1.5) == repr(1.5)
    assert canon(float("nan")) == "NaN"
    assert canon(None) == "NULL"
    assert canon(True) == "True"
    # decimal compares through its float image (both engines render the
    # same decimal; the driver hashes strings, we canon via float repr)
    assert canon(decimal.Decimal("1.250")) == repr(1.25)
    assert canon(datetime.date(2026, 1, 2)) == "2026-01-02"


def test_multiset_is_order_insensitive_in_rows_and_columns():
    a = rows_to_multiset(["x", "y"], [(1, 2), (3, 4)])
    b = rows_to_multiset(["y", "x"], [(4, 3), (2, 1)])
    assert a == b


def test_multiset_detects_value_mismatch():
    a = rows_to_multiset(["x"], [(1,), (2,)])
    b = rows_to_multiset(["x"], [(1,), (3,)])
    assert a != b


def test_multiset_detects_duplicate_count_mismatch():
    a = rows_to_multiset(["x"], [(1,), (1,)])
    b = rows_to_multiset(["x"], [(1,)])
    assert a != b


def test_multiset_detects_float_last_ulp():
    x = 0.1 + 0.2
    y = 0.3
    assert x != y  # the classic
    a = rows_to_multiset(["x"], [(x,)])
    b = rows_to_multiset(["x"], [(y,)])
    assert a != b  # repr-based canon preserves the distinction


def test_strict_canon_is_tighter_than_driver_canon():
    from tools.check_oracle import canon_strict

    # decimal scale differences are invisible to the lossy canon but
    # MUST be visible to strict (a driver hashing rendered strings would
    # see them)
    a, b = decimal.Decimal("1.5"), decimal.Decimal("1.500000000")
    assert canon(a) == canon(b)
    assert canon_strict(a) != canon_strict(b)
    # float bit patterns: equal doubles canon equal, 1-ulp apart differ
    x = 0.1 + 0.2
    assert canon_strict(x) != canon_strict(0.3)
    assert canon_strict(x) == canon_strict(x)
    # type tags: int 1, float 1.0, bool True, string "1" all distinct
    tags = {canon_strict(v) for v in (1, 1.0, True, "1")}
    assert len(tags) == 4
    assert canon_strict(None) == "NULL"
    assert canon_strict(float("nan")) == "f:NaN"


def test_oracle_lint_is_clean():
    """Every release-sensitive construct in oracle SQL is either fixed
    or an argued allowlist entry (tools/lint_oracles.py) — the round-5
    driver hash-mismatch class cannot re-enter silently."""
    from tools.lint_oracles import ALLOWLIST, PATTERNS, main

    assert main() == 0
    # the allowlist only names real queries (no stale entries)
    import __spark_entry__ as E

    names = set(E.oracle_sql())
    stale = [q for q, _ in ALLOWLIST if q not in names]
    assert stale == [], f"allowlist names unknown queries: {stale}"
    # the round-5 root-cause pattern is among the lint's patterns
    assert any(n == "digit-strip" for n, _ in PATTERNS)
