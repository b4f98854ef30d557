"""Dedup operator tests with hand-computable fixtures."""

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators import dedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
    (3, "completely different content about spark engines"),
    (4, "completely different content about spark engines!"),  # near dup of 3
    (5, "zzzz"),  # shorter than shingle size
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup_stats(spark, docs):
    row = D.exact_dedup_stats(docs, ["text"]).first()
    assert row["total_rows"] == 6
    assert row["unique_rows"] == 5
    assert row["removable_duplicates"] == 1
    assert row["duplicate_groups"] == 1


def test_exact_dedup(spark, docs):
    assert D.exact_dedup(docs, ["text"]).count() == 5


def test_shingles_short_doc(spark, docs):
    sh = D.shingles(docs.where(F.col("doc_id") == 5), "doc_id", "text", k=8)
    rows = sh.collect()
    assert len(rows) == 1 and rows[0]["shingle"] == "zzzz"


def test_minhash_identical_docs_identical_signatures(spark, docs):
    sigs = D.minhash_signatures(docs, "doc_id", "text", num_perm=8).collect()
    by_id = {r["doc_id"]: tuple(r)[1:] for r in sigs}
    assert by_id[0] == by_id[1]
    assert by_id[0] != by_id[3]


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
def test_minhash_near_duplicates(spark, docs, hash_fn):
    out = D.minhash_near_duplicates(
        docs, "doc_id", "text", num_perm=16, bands=8, threshold=0.5, hash_fn=hash_fn
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out}
    assert pairs[(0, 1)] == 1.0  # exact dups always survive
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_ngram_jaccard_exact_values(spark, docs):
    out = D.ngram_jaccard_pairs(docs, "doc_id", "text", k=8, threshold=0.0).collect()
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert j[(0, 1)] == 1.0
    # near-dups share most shingles; disjoint docs share none
    assert 0.5 < j[(0, 2)] < 1.0
    assert (0, 3) not in j


def test_simhash_hamming(spark, docs):
    fps = D.simhash(docs, "doc_id", "text", bits=32)
    by_id = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    assert by_id[0] == by_id[1]
    pairs = D.simhash_near_duplicates(fps, "doc_id", max_hamming=3, bits=32).collect()
    pset = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert pset[(0, 1)] == 0
    assert (0, 3) not in pset


def test_lsh_plan_is_broadcast_free_of_cartesian(spark, docs):
    # the candidate join must be an equi-join (hash/sort-merge), never a
    # cartesian product
    sigs = D.minhash_signatures(docs, "doc_id", "text", num_perm=8)
    pairs = D.lsh_candidate_pairs(sigs, "doc_id", num_perm=8, bands=4)
    plan = pairs._sc._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan


def test_segment_dedup_keeps_first_occurrence(spark):
    from buildkite_logs_parquet_spark.operators.dedup import segment_dedup

    # doc 1 repeats its own first chunk; doc 2 repeats doc 1's chunk and
    # adds a fresh one; doc 3 is entirely novel
    a = "a b c"
    b = "x y z"
    rows = [
        (1, f"{a} {a}"),      # 2 segments, second is a self-repeat
        (2, f"{a} {b}"),      # first chunk already seen in doc 1
        (3, "p q r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in segment_dedup(df, "doc_id", "text", k=3).collect()
    }
    assert (out[1].n_segments, out[1].n_kept, out[1].dedup_text) == (2, 1, a)
    assert (out[2].n_segments, out[2].n_kept, out[2].dedup_text) == (2, 1, b)
    assert (out[3].n_segments, out[3].n_kept, out[3].dedup_text) == (1, 1, "p q r")


def test_segment_dedup_fully_duplicated_doc_is_empty(spark):
    from buildkite_logs_parquet_spark.operators.dedup import segment_dedup

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in segment_dedup(df, "doc_id", "text", k=3).collect()}
    assert out[1].dedup_text == "a b c"
    assert (out[2].n_kept, out[2].dedup_text) == (0, "")


def test_segment_dedup_corpus_invariants_random(spark):
    """Property: across the whole corpus, every distinct chunk survives in
    exactly ONE document's dedup_text, and each document's kept count
    matches its contribution."""
    import random

    from buildkite_logs_parquet_spark.operators.dedup import segment_dedup

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → many collisions
    K = 3
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in segment_dedup(docs, "doc_id", "text", k=K).collect()}

    # python ground truth
    seen: set[str] = set()
    for doc_id, text in sorted(rows):
        words = text.split()
        chunks = [
            " ".join(words[i : i + K]) for i in range(0, len(words), K)
        ] or [""]
        kept = []
        for ch in chunks:
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
        r = out[doc_id]
        assert r["n_segments"] == len(chunks), doc_id
        assert r["n_kept"] == len(kept), doc_id
        assert r["dedup_text"] == " ".join(kept), doc_id

    # corpus-wide: the total kept count equals the number of distinct
    # chunks in the corpus (each survives exactly once)
    assert sum(r["n_kept"] for r in out.values()) == len(seen)


# ----------------------------------------------------- substring dedup


def _ref_substring_dedup(corpus, k):
    """Sequential reference: remove every non-first occurrence of any
    duplicated k-token window, overlapping windows merged."""
    toks = {i: t.split() for i, t in corpus}
    occs = {}
    for i in sorted(toks):
        ws = toks[i]
        for p in range(len(ws) - k + 1):
            occs.setdefault(tuple(ws[p : p + k]), []).append((i, p))
    removal = {i: [] for i in toks}
    for key, lst in occs.items():
        if len(lst) >= 2:
            for (i, p) in sorted(lst)[1:]:
                removal[i].append((p, p + k))
    out = {}
    for i, ws in toks.items():
        ivs = sorted(removal[i])
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        keep = [
            w
            for j, w in enumerate(ws)
            if not any(s <= j < e for s, e in merged)
        ]
        out[i] = (
            len(ws),
            len(ws) - len(keep),
            len(merged),
            " ".join(keep),
        )
    return out


def test_substring_dedup_matches_reference(spark):
    from buildkite_logs_parquet_spark.operators.dedup import substring_dedup

    corpus = [
        # cross-doc duplicate shifted by one token (defeats chunk
        # alignment, caught by the rolling window)
        (1, "intro one two three four five six outro"),
        (2, "pad intro one two three four five six tail end"),
        # within-doc repetition with overlapping occurrences
        (3, "a b c a b c a b c unique tail here now"),
        # shorter than k: untouched
        (4, "tiny doc"),
        # fully duplicated doc (every window already seen in doc 1's text)
        (5, "intro one two three four five six outro"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    k = 4
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_removed"],
            r["n_dup_spans"],
            r["dedup_text"],
        )
        for r in substring_dedup(docs, "doc_id", k=k).collect()
    }
    want = _ref_substring_dedup(corpus, k)
    assert got == want
    # the globally-first occurrence survives verbatim
    assert got[1][3] == corpus[0][1]
    # the fully duplicated doc is fully removed
    assert got[5][3] == "" and got[5][1] == got[5][0]
    # doc 4 untouched
    assert got[4] == (2, 0, 0, "tiny doc")


def test_substring_dedup_layout_independent(spark):
    import random

    from buildkite_logs_parquet_spark.operators.dedup import substring_dedup

    rng = random.Random(5)
    vocab = ["w%d" % i for i in range(30)]
    shared = " ".join(rng.choice(vocab) for _ in range(12))
    rows = []
    for i in range(40):
        own = " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 25)))
        rows.append((i, f"{own} {shared}" if i % 3 == 0 else own))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, substring_dedup(docs, "doc_id", k=6).collect()))
    b = sorted(
        map(tuple, substring_dedup(docs.repartition(17), "doc_id", k=6).collect())
    )
    assert a == b
    want = _ref_substring_dedup(rows, 6)
    got = {t[0]: tuple(t[1:]) for t in a}
    assert got == want


def test_substring_dedup_rolling_matches_md5_path(spark):
    # the O(n) Buzhash rolling path and the O(n·k) gram-text md5 path
    # must select the identical duplicated-span set — window hashing is
    # an implementation detail, not a semantic one.  Random corpus with
    # planted shifted duplicates, repeated tokens, and near-misses.
    import random

    from buildkite_logs_parquet_spark.operators.dedup import substring_dedup

    rng = random.Random(11)
    vocab = ["t%d" % i for i in range(40)]
    shared = " ".join(rng.choice(vocab) for _ in range(15))
    rows = []
    for i in range(60):
        own = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30)))
        if i % 4 == 0:
            rows.append((i, f"{own} {shared}"))
        elif i % 4 == 1:
            rows.append((i, f"{shared} {own}"))
        else:
            rows.append((i, own))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (4, 7):
        a = sorted(
            map(tuple, substring_dedup(docs, "doc_id", k=k, hash_fn="rolling").collect())
        )
        b = sorted(
            map(tuple, substring_dedup(docs, "doc_id", k=k, hash_fn="md5").collect())
        )
        assert a == b, k
        want = _ref_substring_dedup(rows, k)
        assert {t[0]: tuple(t[1:]) for t in a} == want


# ---------------------------------------------- incremental signature lake

HISTORY = DOCS
BATCH = [
    (10, "the quick brown fox jumps over the lazy dog"),  # dup of hist 0/1
    (11, "novel text about incremental corpus maintenance"),
    (12, "novel text about incremental corpus maintenance!"),  # near dup of 11
    (13, "entirely unrelated payload mentioning nothing shared"),
]


def _union_pairs(spark, threshold=0.5):
    both = spark.createDataFrame(HISTORY + BATCH, "doc_id long, text string")
    out = D.minhash_near_duplicates(
        both, "doc_id", "text", num_perm=16, bands=8, threshold=threshold
    ).collect()
    batch_ids = {b[0] for b in BATCH}
    return {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in out
        if r["id_a"] in batch_ids or r["id_b"] in batch_ids
    }


def test_incremental_near_dups_equals_full_recompute(spark, tmp_path):
    hist = spark.createDataFrame(HISTORY, "doc_id long, text string")
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    D.write_signature_lake(
        hist, "doc_id", "text", "sig_lake_t1", num_perm=16, bands=8, n_buckets=4
    )
    try:
        out = D.incremental_near_dups(
            batch, "doc_id", "text", "sig_lake_t1",
            num_perm=16, bands=8, threshold=0.5,
        ).collect()
        got = {}
        for r in out:
            a, b = sorted((r["id_a"], r["id_b"]))
            got[(a, b)] = r["est_jaccard"]
            # orientation: history pairs put the NEW doc in id_a
            if r["side"] == "history":
                assert r["id_a"] >= 10 and r["id_b"] < 10
            else:
                assert r["id_a"] >= 10 and r["id_b"] >= 10 and r["id_a"] < r["id_b"]
        assert got == _union_pairs(spark)
        assert (0, 10) in got and (1, 10) in got  # history hits
        assert (11, 12) in got  # in-batch pair
        assert not any(13 in p for p in got)
    finally:
        spark.sql("DROP TABLE IF EXISTS sig_lake_t1")


def test_incremental_near_dups_salted_bit_equal(spark):
    """n_salts>1 (skew hatch) must produce the identical pair set: the
    history probe becomes a (band_key, salt) join, the in-batch self-join
    goes triangular — and the plan actually carries the salt."""
    hist = spark.createDataFrame(HISTORY, "doc_id long, text string")
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    D.write_signature_lake(
        hist, "doc_id", "text", "sig_lake_salt", num_perm=16, bands=8, n_buckets=4
    )
    try:
        plain = sorted(
            map(
                tuple,
                D.incremental_near_dups(
                    batch, "doc_id", "text", "sig_lake_salt",
                    num_perm=16, bands=8, threshold=0.5,
                ).collect(),
            )
        )
        salted_df = D.incremental_near_dups(
            batch, "doc_id", "text", "sig_lake_salt",
            num_perm=16, bands=8, threshold=0.5, n_salts=4,
        )
        assert "pmod" in salted_df._jdf.queryExecution().executedPlan().toString()
        salted = sorted(map(tuple, salted_df.collect()))
        assert salted == plain and len(plain) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS sig_lake_salt")


def test_incremental_append_grows_history(spark):
    hist = spark.createDataFrame(HISTORY, "doc_id long, text string")
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    D.write_signature_lake(
        hist, "doc_id", "text", "sig_lake_t2", num_perm=16, bands=8, n_buckets=4
    )
    try:
        D.write_signature_lake(
            batch, "doc_id", "text", "sig_lake_t2",
            num_perm=16, bands=8, n_buckets=4, mode="append",
        )
        third = spark.createDataFrame(
            [(20, "novel text about incremental corpus maintenance?")],
            "doc_id long, text string",
        )  # near dup of batch doc 11 — only findable if the append landed
        out = D.incremental_near_dups(
            third, "doc_id", "text", "sig_lake_t2",
            num_perm=16, bands=8, threshold=0.5,
        ).collect()
        hits = {r["id_b"] for r in out}
        assert 11 in hits and 12 in hits
        assert all(r["side"] == "history" for r in out)
    finally:
        spark.sql("DROP TABLE IF EXISTS sig_lake_t2")


def test_incremental_probe_lake_side_never_reshuffles(spark, tmp_path):
    """Differential plan assertion: the SAME probe join against a plain
    parquet signature dump needs one more Exchange than against the
    bucketed lake — i.e. bucketing removed the lake side's shuffle."""
    from buildkite_logs_parquet_spark.plans.checks import explain_str

    hist = spark.createDataFrame(HISTORY, "doc_id long, text string")
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    D.write_signature_lake(
        hist, "doc_id", "text", "sig_lake_t3", num_perm=16, bands=8, n_buckets=4
    )
    flat = str(tmp_path / "flat_sigs")
    D.banded_signatures(hist, "doc_id", "text", num_perm=16, bands=8).write.parquet(flat)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import re

        def n_exchanges(df):
            # formatted explain lists each node once as "(N) Exchange"
            return len(re.findall(r"^\(\d+\) Exchange", explain_str(df), re.M))

        probe = D.banded_signatures(batch, "doc_id", "text", num_perm=16, bands=8)
        bucketed = probe.join(spark.table("sig_lake_t3"), on="band_key")
        plain = probe.join(spark.read.parquet(flat), on="band_key")
        n_b, n_p = n_exchanges(bucketed), n_exchanges(plain)
        assert "SelectedBucketsCount" in explain_str(bucketed)
        assert n_b == n_p - 1, (n_b, n_p)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS sig_lake_t3")


# --------------------------------------------------- paragraph-level dedup


def test_paragraph_dedup_removes_boilerplate_keeps_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "Header line\nUnique content one\nFooter line"),
            (2, "Header line\nUnique content two\nFooter line"),
            (3, "Header line"),  # pure boilerplate
            (4, ""),  # empty doc still yields a row
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in D.paragraph_dedup(docs, "doc_id").collect()}
    assert out[1]["dedup_text"] == "Header line\nUnique content one\nFooter line"
    assert out[1]["n_paragraphs"] == 3 and out[1]["n_kept"] == 3
    assert out[2]["dedup_text"] == "Unique content two"
    assert out[2]["n_kept"] == 1
    assert out[3]["dedup_text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["n_paragraphs"] == 0 and out[4]["dedup_text"] == ""


def test_paragraph_dedup_min_chars_exempts_short_paragraphs(spark):
    docs = spark.createDataFrame(
        [(1, "Yes\nLong enough paragraph\nYes"), (2, "Yes")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in D.paragraph_dedup(docs, "doc_id", min_chars=4).collect()
    }
    # "Yes" (3 chars) is below the threshold: duplicated but never dropped
    assert out[1]["dedup_text"] == "Yes\nLong enough paragraph\nYes"
    assert out[2]["dedup_text"] == "Yes"


def test_paragraph_dedup_within_doc_duplicates(spark):
    docs = spark.createDataFrame(
        [(7, "AAAA\nBBBB\nAAAA\nAAAA")], "doc_id long, text string"
    )
    row = D.paragraph_dedup(docs, "doc_id").collect()[0]
    assert row["dedup_text"] == "AAAA\nBBBB"
    assert row["n_paragraphs"] == 4 and row["n_kept"] == 2


def test_normalize_for_dedup_folds_case_accents_digits_punct(spark):
    df = spark.createDataFrame(
        [
            ("Café, Déjà-Vu 2024!",),
            ("cafe deja vu 0000",),
            ("  CAFE   DEJA   VU 1999 ",),
        ],
        "t string",
    )
    vals = [
        r["n"]
        for r in df.select(D.normalize_for_dedup(F.col("t")).alias("n")).collect()
    ]
    assert vals[0] == vals[1] == vals[2] == "cafe deja vu 0000"


def test_paragraph_dedup_normalized_catches_near_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "Copyright 2023, Site Inc.\nreal content one"),
            (2, "copyright 2024 SITE inc\nreal content two"),
        ],
        "doc_id long, text string",
    )
    plain = {
        r["doc_id"]: r for r in D.paragraph_dedup(docs, "doc_id").collect()
    }
    assert plain[2]["n_kept"] == 2  # exact hashing misses the variant
    norm = {
        r["doc_id"]: r
        for r in D.paragraph_dedup(docs, "doc_id", normalize=True).collect()
    }
    assert norm[2]["dedup_text"] == "real content two"  # variant collapsed
    assert norm[1]["dedup_text"] == docs.collect()[0]["text"]  # original kept


def test_paragraph_dedup_random_corpus_matches_sequential(spark):
    """Property: paragraph_dedup equals a sequential keep-first sweep in
    (doc_id, position) order over a random corpus with heavy collisions."""
    import random

    rng = random.Random(23)
    lines = [f"line {i} of shared boilerplate text" for i in range(6)]
    rows = [
        (
            i,
            "\n".join(
                rng.choice(lines) for _ in range(rng.randint(0, 5))
            ),
        )
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in D.paragraph_dedup(docs, "doc_id").collect()}

    seen: set[str] = set()
    for doc_id, text in sorted(rows):
        paras = [p for p in text.split("\n") if p.strip()]
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        r = out[doc_id]
        assert r["n_paragraphs"] == len(paras), doc_id
        assert r["n_kept"] == len(kept), doc_id
        assert r["dedup_text"] == "\n".join(kept), doc_id
    assert sum(r["n_kept"] for r in out.values()) == len(seen)


def test_incremental_near_dups_random_corpus(spark):
    """Property: on a random collision-heavy corpus, the incremental
    operator (history lake + batch probe) reproduces the full-recompute
    pair set restricted to batch-involving pairs."""
    import random

    rng = random.Random(29)
    vocab = [f"tok{i}" for i in range(10)]
    mk = lambda: " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 20)))  # noqa: E731
    hist_rows = [(i, mk()) for i in range(25)]
    batch_rows = [(100 + i, mk()) for i in range(12)]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    both = spark.createDataFrame(hist_rows + batch_rows, "doc_id long, text string")

    D.write_signature_lake(
        hist, "doc_id", "text", "sig_lake_prop", num_perm=16, bands=8, n_buckets=4
    )
    try:
        inc = D.incremental_near_dups(
            batch, "doc_id", "text", "sig_lake_prop",
            num_perm=16, bands=8, threshold=0.4,
        ).collect()
        got = {tuple(sorted((r["id_a"], r["id_b"]))): r["est_jaccard"] for r in inc}
        full = D.minhash_near_duplicates(
            both, "doc_id", "text", num_perm=16, bands=8, threshold=0.4
        ).collect()
        batch_ids = {i for i, _ in batch_rows}
        want = {
            (r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in full
            if r["id_a"] in batch_ids or r["id_b"] in batch_ids
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS sig_lake_prop")


class TestNeardupEval:
    def test_identical_docs_full_recall(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import neardup_eval

        rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(4)]
        rows += [(10 + i, f"completely different text number {i} with unique words {i*7}") for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = neardup_eval(df, "doc_id", "text", threshold=0.5).first()
        # the 6 identical-doc pairs are truth; identical signatures always
        # share every band and agree on every permutation
        assert r["n_truth"] >= 6
        assert r["candidate_hits"] >= 6 and r["predicted_hits"] >= 6
        assert r["candidate_recall"] >= 6 / r["n_truth"]
        assert r["recall"] is not None and r["precision"] is not None
        assert r["n_predicted"] <= r["n_candidates"]

    def test_disjoint_docs_zero_truth_null_ratios(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import neardup_eval

        df = spark.createDataFrame(
            [(1, "aaaaaaaaaaaaaaaaaaaaaaa"), (2, "zzzzzzzzzzzzzzzzzzzzzzz")],
            "doc_id long, text string",
        )
        r = neardup_eval(df, "doc_id", "text", threshold=0.5).first()
        assert r["n_truth"] == 0 and r["predicted_hits"] == 0
        assert r["recall"] is None  # try_divide: no truth -> NULL, not error

    def test_eval_on_testdata_is_deterministic(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import neardup_eval

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = neardup_eval(docs, "doc_id", "text").first()
        b = neardup_eval(docs, "doc_id", "text").first()
        assert a == b
        assert a["candidate_hits"] <= a["n_truth"]
        assert a["predicted_hits"] <= a["n_predicted"]

    def test_max_shingle_df_caps_the_truth_universe(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )

        # 'commonXY' 8-grams shared by ALL four docs; unique tails pair none
        rows = [(i, f"commonboilerplate unique{i}tail{i}") for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        full = ngram_jaccard_pairs(df, "doc_id", "text", k=8).count()
        capped = ngram_jaccard_pairs(
            df, "doc_id", "text", k=8, max_shingle_df=2
        ).count()
        assert full == 6  # all pairs share the boilerplate shingles
        assert capped == 0  # cap removes the boilerplate-only evidence


class TestLshTuning:
    def test_low_threshold_prefers_many_bands(self):
        from buildkite_logs_parquet_spark.operators.dedup import lsh_tuning

        lo = lsh_tuning(16, 0.2)
        hi = lsh_tuning(16, 0.9)
        # low threshold -> more bands (higher recall); high -> fewer
        assert lo["bands"] > hi["bands"]
        assert lo["bands"] * lo["rows_per_band"] == 16

    def test_curve_monotone_and_bounded(self):
        from buildkite_logs_parquet_spark.operators.dedup import lsh_tuning

        t = lsh_tuning(8, 0.5)
        probs = [p for _, p in t["curve"]]
        assert probs == sorted(probs)
        assert probs[0] == 0.0 and probs[-1] == 1.0
        import pytest as _pytest

        with _pytest.raises(ValueError):
            lsh_tuning(8, 1.5)

    def test_matches_registered_config_sanity(self):
        from buildkite_logs_parquet_spark.operators.dedup import lsh_tuning

        # the repo's 8-perm near-dup config targets ~0.5: the advisor's
        # pick for that point collides >80% at s=0.7 and <35% at s=0.2
        t = lsh_tuning(8, 0.5)
        curve = dict(t["curve"])
        assert curve[0.7] > 0.8
        assert curve[0.2] < 0.35


def test_exact_dedup_against_lake_both_paths(spark, tmp_path):
    from buildkite_logs_parquet_spark.operators.dedup import (
        exact_dedup_against_lake,
        write_digest_lake,
    )

    hist = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(500)], "doc_id long, text string"
    )
    lake = str(tmp_path / "digests")
    write_digest_lake(hist, lake, ["text"], mode="overwrite")

    # batch: 30 known dups + 20 fresh docs
    batch = spark.createDataFrame(
        [(1000 + i, f"text-{i}") for i in range(30)]
        + [(2000 + i, f"fresh-{i}") for i in range(20)],
        "doc_id long, text string",
    )
    small = exact_dedup_against_lake(batch, lake, ["text"])
    assert sorted(r["doc_id"] for r in small.collect()) == [
        2000 + i for i in range(20)
    ]
    assert small.columns == ["doc_id", "text"]

    # large-batch path (force the anti-join) gives the identical result
    big = exact_dedup_against_lake(batch, lake, ["text"], max_probe_inlist=5)
    assert sorted(r["doc_id"] for r in big.collect()) == sorted(
        r["doc_id"] for r in small.collect()
    )

    # the IN-list probe pushes into the lake scan
    from buildkite_logs_parquet_spark.operators.dedup import content_digest
    from pyspark.sql import functions as F2

    digs = [
        r["_digest"]
        for r in batch.limit(3)
        .withColumn("_digest", content_digest(["text"]))
        .collect()
    ]
    scan = spark.read.parquet(lake).where(F2.col("digest").isin(digs))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(digest" in plan

    # no lake yet → batch passes through
    assert (
        exact_dedup_against_lake(batch, str(tmp_path / "missing"), ["text"]).count()
        == batch.count()
    )

    # a lake WITHOUT a digest column (wrong table) must raise, not
    # silently skip dedup — only the missing-path case passes through
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    wrong = str(tmp_path / "wrong_table")
    hist.write.parquet(wrong)
    with _pytest.raises(AnalysisException):
        exact_dedup_against_lake(batch, wrong, ["text"]).count()


def test_split_leakage_flags_cross_split_near_dups(spark):
    from buildkite_logs_parquet_spark.operators.dedup import (
        split_leakage,
        split_leakage_summary,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest to hide from the loud hunters"
    )
    rows = [
        (0, base, "train"),
        (1, base + " extra tail words", "test"),   # cross-split near-dup
        (2, base + " extra tail words!", "train"), # in-split near-dup of 1? no: 1 is test -> crosses
        (3, "completely different text about spark query planning and shuffles everywhere", "test"),
        (4, base + " extra tail word", "train"),   # near-dup family
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    leaks = split_leakage(
        df, "doc_id", "text", "split", num_perm=16, bands=8, threshold=0.5
    )
    got = {(r["id_a"], r["id_b"]) for r in leaks.collect()}
    # every flagged pair crosses the boundary and involves the dup family
    sp = dict((i, s) for i, _, s in rows)
    assert got, "expected at least one cross-split near-dup"
    for a, b in got:
        assert sp[a] != sp[b]
        assert {a, b} <= {0, 1, 2, 4}
    # doc 3 never appears
    assert all(3 not in p for p in got)

    summary = split_leakage_summary(leaks).collect()
    assert len(summary) == 1
    assert summary[0]["split_lo"] == "test" and summary[0]["split_hi"] == "train"
    assert summary[0]["n_pairs"] == len(got)


class TestCDCSegmentDedup:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    @staticmethod
    def _words(seed, n):
        import random

        rng = random.Random(seed)
        return " ".join(
            "".join(rng.choice("abcdefghij") for _ in range(5))
            for _ in range(n)
        )

    def test_exact_duplicate_fully_deduped(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import (
            cdc_segment_dedup,
        )

        t = self._words(1, 200)
        out = {
            r["doc_id"]: r
            for r in cdc_segment_dedup(
                self._df(spark, [(0, t), (1, t)]), "doc_id"
            ).collect()
        }
        assert out[0]["n_kept"] == out[0]["n_segments"]
        assert out[0]["dedup_text"] == t
        assert out[1]["n_kept"] == 0 and out[1]["dedup_text"] == ""
        assert out[1]["n_segments"] == out[0]["n_segments"]

    def test_insertion_robustness_beats_fixed_chunks(self, spark):
        """THE content-defined property: prepending one token must only
        cost the chunks overlapping the edit, where fixed-k chunking
        loses alignment for the whole document."""
        from buildkite_logs_parquet_spark.operators.dedup import (
            cdc_segment_dedup,
            segment_dedup,
        )

        t = self._words(2, 300)
        shifted = "zzzzz " + t
        df = self._df(spark, [(0, t), (1, shifted)])
        cdc = {
            r["doc_id"]: r for r in cdc_segment_dedup(df, "doc_id").collect()
        }
        fixed = {
            r["doc_id"]: r
            for r in segment_dedup(df, "doc_id", "text", k=10).collect()
        }
        # fixed chunking: nearly every chunk of the shifted doc survives
        # (misaligned -> novel); CDC: only the chunk(s) at the edit do
        assert fixed[1]["n_kept"] >= fixed[1]["n_segments"] - 1
        assert cdc[1]["n_kept"] <= max(3, cdc[1]["n_segments"] // 4)

    def test_span_length_bounds(self):
        import numpy as np
        import pandas as pd

        from buildkite_logs_parquet_spark.operators.dedup import _cdc_spans

        gen, _schema = _cdc_spans("doc_id", "bigint", 4, 16, 4, 64)
        rng = np.random.default_rng(5)
        th = rng.integers(-(2**62), 2**62, size=500).tolist()
        pdf = pd.DataFrame({"doc_id": [7], "_th": [th]})
        out = pd.concat(list(gen(iter([pdf]))))
        lens = out["seg_len"].to_numpy()
        # every span within [min,max] except a possibly-short tail
        assert (lens <= 64).all()
        assert (lens[:-1] >= 4).all()
        assert lens.sum() == 500
        starts = out["pos"].to_numpy()
        assert starts[0] == 0
        assert ((starts[1:] - starts[:-1]) == lens[:-1]).all()

    def test_layout_deterministic(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import (
            cdc_segment_dedup,
        )

        rows = [(i, self._words(i, 80)) for i in range(20)]
        a = sorted(
            map(tuple, cdc_segment_dedup(self._df(spark, rows), "doc_id").collect())
        )
        b = sorted(
            map(
                tuple,
                cdc_segment_dedup(
                    self._df(spark, rows).repartition(7), "doc_id"
                ).collect(),
            )
        )
        assert a == b


class TestSetSimilarityJoin:
    @staticmethod
    def _brute(rows, t):
        import itertools
        import math

        sets = {i: set(s.lower().split()) for i, s in rows}
        out = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter * 1_000_000 >= round(t * 1e6) * union:
                out[(a, b)] = (inter, union)
        return out

    def _rows(self):
        base = "the quick brown fox jumps over the lazy dog near a river"
        rows = [(0, base)]
        rows.append((1, base + " tonight"))                 # near-dup
        rows.append((2, base.replace("fox", "cat")))        # near-dup
        rows.append((3, "completely different words here")) # unrelated
        rows.append((4, base))                              # exact dup
        # shared stopwords only — must NOT pair at 0.5
        rows.append((5, "the a over near something else entirely my friend"))
        # small sets
        rows.append((6, "alpha beta"))
        rows.append((7, "alpha beta"))
        rows.append((8, "alpha gamma"))
        return rows

    @pytest.mark.parametrize("t", [0.5, 0.75, 0.9, 1.0])
    def test_matches_brute_force_exactly(self, spark, t):
        from buildkite_logs_parquet_spark.operators.dedup import (
            set_similarity_join,
        )

        rows = self._rows()
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): (r["intersection"], r["union_size"])
            for r in set_similarity_join(df, "doc_id", "text", t).collect()
        }
        assert got == self._brute(rows, t)

    def test_completeness_on_randomized_corpus(self, spark):
        # the prefix filter must lose NOTHING: randomized word soups with
        # heavy vocabulary overlap, checked against brute force
        import random

        rng = random.Random(13)
        vocab = [f"w{j}" for j in range(30)]
        rows = [
            (i, " ".join(rng.sample(vocab, rng.randint(3, 12))))
            for i in range(60)
        ]
        from buildkite_logs_parquet_spark.operators.dedup import (
            set_similarity_join,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): (r["intersection"], r["union_size"])
            for r in set_similarity_join(df, "doc_id", "text", 0.6).collect()
        }
        assert got == self._brute(rows, 0.6)

    def test_no_cartesian_and_validation(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import (
            set_similarity_join,
        )
        from buildkite_logs_parquet_spark.plans.checks import explain_str

        df = spark.createDataFrame(self._rows(), "doc_id long, text string")
        plan = explain_str(
            set_similarity_join(df, "doc_id", "text", 0.7), "simple"
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        with pytest.raises(ValueError):
            set_similarity_join(df, "doc_id", "text", 0.0)
        with pytest.raises(ValueError):
            set_similarity_join(df, "doc_id", "text", 0.5, tokenizer="x")


class TestContainmentJoin:
    def _brute(self, lrows, rrows, t):
        import math

        def words(s):
            return {w for w in s.lower().split() if w}

        out = {}
        for la, ta in lrows:
            A = words(ta)
            if not A:
                continue
            need = math.ceil(t * len(A))
            for lb, tb in rrows:
                B = words(tb)
                inter = len(A & B)
                if inter * 1_000_000 >= int(round(t * 1_000_000)) * len(A):
                    out[(la, lb)] = (inter, len(A), len(B))
        return out

    def test_equals_brute_force_at_three_thresholds(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import (
            containment_join,
        )

        lrows = [
            (1, "the quick brown fox"),
            (2, "lazy dog sleeps"),
            (3, "quick fox"),
            (4, "alpha beta gamma delta epsilon"),
        ]
        rrows = [
            (10, "the quick brown fox jumps over the lazy dog every day"),
            (11, "alpha beta gamma"),
            (12, "completely different tokens here"),
        ]
        left = spark.createDataFrame(lrows, "doc_id long, text string")
        right = spark.createDataFrame(rrows, "doc_id long, text string")
        for t in (0.5, 0.8, 1.0):
            got = {
                (r["id_a"], r["id_b"]): (
                    r["intersection"],
                    r["size_a"],
                    r["size_b"],
                )
                for r in containment_join(
                    left, right, "doc_id", "text", threshold=t
                ).collect()
            }
            assert got == self._brute(lrows, rrows, t), t

    def test_quote_detection_invisible_to_jaccard(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import (
            containment_join,
            set_similarity_join,
        )

        quote = "to be or not to be that is the question"
        page = quote + " " + " ".join(f"filler{i}" for i in range(200))
        left = spark.createDataFrame([(1, quote)], "doc_id long, text string")
        right = spark.createDataFrame([(2, page)], "doc_id long, text string")
        got = containment_join(
            left, right, "doc_id", "text", threshold=0.9
        ).collect()
        assert len(got) == 1 and got[0]["containment_pm"] == 1_000_000
        # the symmetric join at even a LOW jaccard threshold misses it
        both = left.unionByName(right)
        jac = set_similarity_join(
            both, "doc_id", "text", threshold=0.5
        ).collect()
        assert jac == []

    def test_containment_pm_integer_and_plan_clean(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import (
            containment_join,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        half = docs.where("doc_id % 2 = 0")
        out = containment_join(half, docs, "doc_id", "text", threshold=0.9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        rows = out.collect()
        # the a==b self pairs are present by contract and fully contained
        self_pairs = [r for r in rows if r["id_a"] == r["id_b"]]
        assert self_pairs and all(
            r["containment_pm"] == 1_000_000 for r in self_pairs
        )
        for r in rows:
            assert (
                r["containment_pm"]
                == r["intersection"] * 1_000_000 // r["size_a"]
            )
