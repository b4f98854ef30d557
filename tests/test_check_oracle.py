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
