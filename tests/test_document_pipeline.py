"""End-to-end document/audio-corpus composition: a mixed binary drop
(PDFs incl. a near-duplicate pair and junk bytes; WAV + FLAC clips of
the same audio) flows through native extraction → Unicode
normalization → quality features → exact dedup → packing on the text
side, and decode → clip features → frame windows on the audio side —
the round-5 intake formats driving the existing curation surface
end to end."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def media_df(spark):
    from buildkite_logs_parquet_spark.functions.audio_codec import encode_wav
    from buildkite_logs_parquet_spark.functions.flac_codec import encode_flac
    from buildkite_logs_parquet_spark.functions.pdf_text import (
        make_simple_pdf,
    )

    prose = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet field while the merge query spark tools hum "
    ) * 3
    mojibake_page = "café notes".encode("utf-8").decode("cp1252")
    pdfs = [
        (1, make_simple_pdf([prose, "closing page one"])),
        (2, make_simple_pdf([prose, "closing page one"])),  # exact dup of 1
        (3, make_simple_pdf([mojibake_page + " " + prose])),
        (4, b"junk not a pdf"),
    ]
    x = np.clip(
        np.cumsum(np.random.default_rng(3).integers(-50, 51, 2000)),
        -2000,
        2000,
    ).astype(np.int16)
    audio = [
        (10, encode_wav(x, 16000)),
        (11, encode_flac(x.astype(np.int64), 16000, subframe="fixed2")),
    ]
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in pdfs + audio],
        "media_id long, payload binary",
    )


def test_documents_flow_to_packed_training_corpus(spark, media_df):
    from buildkite_logs_parquet_spark.operators import multimodal as M
    from buildkite_logs_parquet_spark.operators import normalize as N
    from buildkite_logs_parquet_spark.operators.curation import (
        gopher_quality_filter,
    )
    from buildkite_logs_parquet_spark.operators.packing import pack_sequences
    from buildkite_logs_parquet_spark.operators.text_analysis import (
        fingerprint,
    )

    docs = M.pdf_text_features(media_df)
    ok = docs.where("decode_ok").select(
        F.col("media_id").alias("doc_id"), "text"
    )
    assert docs.where(~F.col("decode_ok")).count() == 3  # junk + 2 audio

    # normalization repairs the planted mojibake before anything hashes
    norm = N.normalize_text(ok, "text", out_col="text2").select(
        "doc_id", F.col("text2").alias("text")
    )
    fixed = norm.where(F.col("doc_id") == 3).first()["text"]
    assert "café notes" in fixed

    # quality gate keeps the prose docs
    kept = gopher_quality_filter(norm, "text").where("passes")
    assert kept.count() == 3

    # exact dedup collapses the duplicate PDF pair
    fp = fingerprint(kept.select("doc_id", "text"), "doc_id", "text")
    canon = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    assert canon.count() == 2  # {1,2} collapse; 3 distinct

    # pack the survivors into training sequences
    packed = pack_sequences(
        kept.join(canon.select("doc_id"), "doc_id"), "doc_id", "text",
        capacity=64,
    )
    total = packed.agg(F.sum("n_tokens")).first()[0]
    assert packed.count() >= 2 and total > 64


def test_audio_containers_agree_end_to_end(spark, media_df):
    from buildkite_logs_parquet_spark.operators import multimodal as M

    feats = {
        r["media_id"]: r
        for r in M.audio_features(
            media_df.where(F.col("media_id") >= 10)
        ).collect()
    }
    assert feats[10]["decode_ok"] and feats[11]["decode_ok"]
    for k in ("sample_rate", "n_samples", "rms", "zero_crossing_rate"):
        assert feats[10][k] == feats[11][k], k

    windows = M.audio_frame_windows(
        media_df.where(F.col("media_id") == 11), window_ms=50, hop_ms=50
    )
    n = windows.count()
    assert n == 2000 // 800  # 50ms @16kHz = 800 samples per full window
