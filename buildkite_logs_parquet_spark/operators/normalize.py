"""Unicode text normalization for corpus curation.

Web-crawl text arrives in every state Unicode allows: canonically
decomposed sequences (``e`` + U+0301 vs ``é``), compatibility ligatures,
C0/C1 control bytes, run-on whitespace, and mojibake (UTF-8 bytes
mis-decoded as Latin-1/cp1252, the single most common encoding injury in
crawled corpora — CCNet and Dolma both normalize before dedup for
exactly this reason: two byte-different spellings of the same text must
fingerprint identically or every downstream dedup operator under-counts).

Reference parity note: the reference engine (wolfeidau/
buildkite-logs-parquet) has no normalization surface — this module is
part of the training-data extension tier, feeding ``text_analysis.
fingerprint`` / ``operators/dedup`` with canonicalized text.

Spark-first shape: the pure-structural passes (control-char strip,
whitespace collapse) are single ``regexp_replace`` expressions —
JVM-side, codegen'd, zero Python.  Unicode normal forms and accent
folding need the Unicode character database, which Spark SQL does not
expose — those run as Arrow-batched scalar pandas UDFs (series in,
series out; the per-row work is a table lookup, the batch transfer is
the cost and Arrow amortizes it).  Every pass is a narrow map: no
shuffle, rows keep the scan's partitioning, so the operator scales
linearly with input bytes at any cluster size.

Determinism: all passes are pure functions of the input string —
engine-exact and layout-independent.  NFC/NFD and accent folding match
DuckDB's utf8proc implementations (``nfc_normalize``,
``strip_accents``), which the oracle legs rely on; parity is asserted in
tests/test_normalize.py over an adversarial vector set.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")

# C0 controls minus \t\n\r, plus DEL and the C1 range — the characters
# no text corpus should carry (the reference's log parser never emits
# them either; parser.go strips at the terminal-sequence layer instead)
_CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]"

# Mojibake tell-tales: lead bytes of multi-byte UTF-8 sequences as they
# render when mis-decoded as Latin-1/cp1252.  Only strings containing
# one of these even attempt the (repeatable) repair round-trip.
_MOJIBAKE_HINTS = ("Ã", "Â", "â", "Å", "Ð")


def strip_control_chars(col: Column) -> Column:
    """Drop C0/C1 control characters (keeping ``\\t \\n \\r``) — pure
    JVM ``regexp_replace``, RE2 ∩ Java class so the oracle is
    byte-identical."""
    return F.regexp_replace(col, _CONTROL_CLASS, "")


def collapse_whitespace(col: Column) -> Column:
    """Trim and collapse every whitespace run to one space — pure JVM."""
    return F.regexp_replace(F.trim(col), "\\s+", " ")


def unicode_normalize_col(col: Column, form: str = "NFC") -> Column:
    """Unicode normal form via an Arrow-batched scalar pandas UDF.

    NFC is the curation default (byte-canonical without losing
    information); NFKC additionally folds compatibility characters
    (ligatures, full-width forms) — the right key for dedup
    fingerprints, lossy for display text.
    """
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @pandas_udf("string")
    def _norm(s):  # pd.Series -> pd.Series
        return s.str.normalize(form)

    return _norm(col)


def strip_accents_col(col: Column) -> Column:
    """Accent folding: canonical-decompose, drop combining marks
    (``é``→``e``), then re-compose — the trailing NFC matters for
    scripts whose NFD is algorithmic rather than accentual (Hangul
    syllables decompose to jamo; without recomposition they'd stay
    decomposed).  Characters with no canonical decomposition (``ø``)
    pass through.  Same contract as DuckDB/utf8proc ``strip_accents``,
    which the oracle leg replays; parity asserted in tests."""

    @pandas_udf("string")
    def _strip(s):  # pd.Series -> pd.Series
        def fold(t):
            if t is None:
                return None
            return unicodedata.normalize(
                "NFC",
                "".join(
                    ch
                    for ch in unicodedata.normalize("NFD", t)
                    if not unicodedata.combining(ch)
                ),
            )

        return s.map(fold)

    return _strip(col)


def fix_mojibake_col(col: Column, max_passes: int = 2) -> Column:
    """Repair UTF-8-mis-decoded-as-Latin-1/cp1252 text (``Ã©``→``é``,
    ``â€™``→``’``) — the ftfy-lite move: re-encode through cp1252
    (Latin-1 fallback for the five cp1252 holes) and accept the
    round-trip only if it decodes as valid UTF-8.  Doubly-encoded text
    repairs across ``max_passes`` iterations; strings without a
    mojibake tell-tale are returned untouched (zero-cost fast path for
    clean corpora).  Pure function of the input — deterministic, but
    Python-codec-defined, so this pass is golden-tested rather than
    SQL-oracled."""

    def _repair(t: str) -> str:
        out = t
        for _ in range(max_passes):
            if not any(h in out for h in _MOJIBAKE_HINTS):
                break
            try:
                raw = out.encode("cp1252")
            except UnicodeEncodeError:
                try:
                    raw = out.encode("latin-1")
                except UnicodeEncodeError:
                    break
            try:
                cand = raw.decode("utf-8")
            except UnicodeDecodeError:
                break
            if cand == out:
                break
            out = cand
        return out

    @pandas_udf("string")
    def _fix(s):  # pd.Series -> pd.Series
        return s.map(lambda t: _repair(t) if t is not None else None)

    return _fix(col)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    form: str = "NFC",
    mojibake: bool = True,
    controls: bool = True,
    whitespace: bool = True,
) -> DataFrame:
    """The composed curation pass, cheapest-first: mojibake repair →
    control strip → Unicode normal form → whitespace collapse.  One
    narrow projection; the only Python is the two Arrow-batched UDF
    stages (skipped entirely when disabled)."""
    c: Column = F.col(text_col)
    if mojibake:
        c = fix_mojibake_col(c)
    if controls:
        c = strip_control_chars(c)
    c = unicode_normalize_col(c, form)
    if whitespace:
        c = collapse_whitespace(c)
    return df.withColumn(out_col, c)


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    secret: str,
    prefix: str = "pid_",
    hex_len: int = 16,
) -> DataFrame:
    """Replace identifier columns with deterministic keyed surrogates:
    ``prefix + hex(md5(secret:value))`` — the pseudonymization step
    between scrubbing and analysis.  Unlike ``pii_scrub``'s redaction it
    PRESERVES joinability and group structure (equal values map to equal
    tokens across every table sharing the ``secret``), while the value
    itself never survives; rotating the secret unlinks every historical
    surrogate at once.

    NULL stays NULL (a surrogate for NULL would fabricate a join key).
    One narrow expression per column — no shuffle, no UDF.  The keyed
    hash means surrogates are only as secret as ``secret``: treat it
    like a credential, and remember pseudonymized data is still
    personal data under most privacy regimes (linkage within the
    dataset remains by design — that is the point).
    """
    if not cols:
        raise ValueError("cols must name at least one column")
    if not secret:
        raise ValueError("secret must be non-empty")
    out = df
    for c in cols:
        tok = F.concat(
            F.lit(prefix),
            F.substring(
                F.md5(F.concat(F.lit(f"{secret}:"), F.col(c).cast("string"))),
                1,
                int(hex_len),
            ),
        )
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), tok))
    return out
