"""Fuzzy entity resolution (operators/linkage.py): blocked candidate
generation, integer edit-distance gating, deterministic best-match, and
the cap-visibility audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.linkage import (
    blocking_keys,
    candidate_pairs,
    link_entities,
    linkage_audit,
    resolve_entities,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


class TestBlockingAndGate:
    def test_punctuation_and_case_variants_link_at_distance_zero(self, spark):
        df = _df(
            spark,
            [
                (1, "Acme Corp."),
                (2, "ACME-corp"),
                (3, "acme  corp"),
                (4, "completely different name"),
            ],
        )
        got = {
            (r["id_a"], r["id_b"]): r["lev"]
            for r in link_entities(df, df).collect()
        }
        assert got[(1, 2)] == 0 and got[(1, 3)] == 0 and got[(2, 3)] == 0
        assert not any(4 in k for k in got)

    def test_single_edit_pairs_always_share_a_block(self, spark):
        # one substitution/insertion/deletion anywhere in a >=9-char
        # normalized string leaves the prefix, the suffix, or the
        # (prefix2, length-bucket) key intact — the OR-amplification
        # recall claim, checked exhaustively over every edit position
        base = "algorithmic data systems"
        rows = [(0, base)]
        rid = 1
        expected = set()
        for i in range(len(base)):
            if base[i] == " ":
                continue
            rows.append((rid, base[:i] + "x" + base[i + 1 :]))  # sub
            expected.add((0, rid))
            rid += 1
            rows.append((rid, base[:i] + base[i + 1 :]))  # del
            expected.add((0, rid))
            rid += 1
        df = _df(spark, rows)
        got = {
            (r["id_a"], r["id_b"])
            for r in link_entities(df, df, rel_pct=25).collect()
        }
        assert expected <= got

    def test_relative_gate_is_pure_integers(self, spark):
        # len 10 vs 10, lev 3: 300 <= rel_pct*10 iff rel_pct >= 30
        df = _df(spark, [(1, "abcdefghij"), (2, "abcdefgxyz")])
        assert link_entities(df, df, rel_pct=29).count() == 0
        got = link_entities(df, df, rel_pct=30).collect()
        assert [(r["id_a"], r["id_b"], r["lev"]) for r in got] == [(1, 2, 3)]

    def test_max_dist_cap(self, spark):
        df = _df(spark, [(1, "abcdefghij"), (2, "abcdefgxyz")])
        assert link_entities(df, df, rel_pct=90, max_dist=2).count() == 0
        assert link_entities(df, df, rel_pct=90, max_dist=3).count() == 1

    def test_self_link_orients_and_never_self_pairs(self, spark):
        df = _df(spark, [(5, "same text here"), (2, "same text here")])
        got = link_entities(df, df).collect()
        assert [(r["id_a"], r["id_b"]) for r in got] == [(2, 5)]

    def test_two_sided_linkage_keeps_all_directions(self, spark):
        left = _df(spark, [(1, "acme corp")])
        right = _df(spark, [(9, "acme corp"), (1, "acme corp")])
        got = {(r["id_a"], r["id_b"]) for r in link_entities(left, right).collect()}
        # cross-source: id equality is NOT identity, only (1,1) self is
        # excluded by id inequality
        assert got == {(1, 9)}


class TestResolveAndAudit:
    def test_best_match_is_min_lev_then_min_id(self, spark):
        left = _df(spark, [(1, "acme corporation")])
        right = _df(
            spark,
            [
                (30, "acme corporation"),  # lev 0
                (20, "acme corporatiox"),  # lev 1
                (10, "acme corporation"),  # lev 0, smaller id
            ],
        )
        m = link_entities(left, right, rel_pct=40)
        got = resolve_entities(m).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["id_a"], r["best_id"], r["best_lev"], r["n_candidates"]) == (
            1, 10, 0, 3,
        )

    def test_hot_block_is_capped_and_counted_not_silent(self, spark):
        # identical normalized text: ALL of a record's blocks are the
        # same three hot keys, so a small cap orphans every record
        rows = [(i, "generic holdings incorporated") for i in range(40)]
        df = _df(spark, rows)
        m = link_entities(df, df, max_block_size=8)
        assert m.count() == 0
        audit = linkage_audit(df, df, max_block_size=8).collect()[0]
        assert audit["n_capped_blocks"] >= 1
        assert audit["n_orphaned_records"] == 40
        # with an adequate cap nothing is dropped (and the dups link)
        audit2 = linkage_audit(df, df, max_block_size=256).collect()[0]
        assert audit2["n_capped_blocks"] == 0
        assert audit2["n_orphaned_records"] == 0
        assert link_entities(df, df, max_block_size=256).count() > 0

    def test_blocking_keys_skip_empty_and_null(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "..."), (4, "ok text")],
            "id long, text string",
        )
        got = blocking_keys(df, "id", "text").select("id").distinct().collect()
        assert {r["id"] for r in got} == {4}


class TestPlanShape:
    def test_no_cartesian_product_in_linkage_plan(self, spark):
        from buildkite_logs_parquet_spark.plans.checks import explain_str

        df = _df(spark, [(i, f"name {i}") for i in range(10)])
        plan = explain_str(
            resolve_entities(link_entities(df, df)), "simple"
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_candidates_deduplicate_multi_block_pairs(self, spark):
        # an identical pair shares ALL blocks; the pair space must still
        # carry it once (distinct), so levenshtein runs once per pair
        df = _df(spark, [(1, "duplicate record"), (2, "duplicate record")])
        cand = candidate_pairs(df, df)
        assert cand.count() == 1


def test_audit_partially_capped_record_is_not_orphaned(spark):
    """A record with SOME capped blocks but at least one surviving block
    still reaches the candidate join — only records that lost ALL their
    blocks count as orphaned (set difference, not multiset subtract)."""
    # 20 records share prefix+l blocks via a common head; distinct tails
    # keep each suffix block tiny
    rows = [(i, f"common head text tail{i:02d}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, text string")
    audit = linkage_audit(df, df, max_block_size=10).collect()[0]
    # the shared p:/l: blocks (20 members each) are capped...
    assert audit["n_capped_blocks"] >= 1
    # ...but every record keeps its private s: suffix block
    assert audit["n_orphaned_records"] == 0
