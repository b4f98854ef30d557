"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side machinery (schemas, Arrow-batched ``mapInPandas`` decode stages,
partition sizing) is real and tested.  Actual codec work is stubbed behind
clearly-marked hooks because media libraries are not available in this
environment: ``decode=...`` accepts any bytes→features callable, the default
``fake_decode`` is deterministic (hash-derived pseudo-dimensions) so
pipelines are testable end-to-end, and ``strict_decode`` raises
``NotImplementedError`` to mark the real-codec seam.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata carried next to every media payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("format", T.StringType(), True),  # png/jpeg/wav/...
        T.StructField("source_uri", T.StringType(), True),
        T.StructField("byte_size", T.LongType(), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, False),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: pseudo width/height/frames and an
    8-dim feature vector derived from the payload digest.  STUB — replace
    with a real codec (PIL/ffmpeg) outside this environment."""
    if payload is None:
        return {"width": None, "height": None, "n_frames": None, "feature": None}
    d = hashlib.sha256(payload).digest()
    return {
        "width": 16 + d[0] % 64,
        "height": 16 + d[1] % 64,
        "n_frames": 1 + d[2] % 8,
        "feature": [round(b / 255.0, 6) for b in d[3:11]],
    }


def real_decode(payload: bytes) -> dict:
    """Real image decode through the stdlib+numpy codecs
    (functions/image_codec.py, jpeg_codec.py, gif_codec.py): PNG (all
    five scanline filters, gray / RGB / RGBA / palette), JPEG (baseline
    + progressive, Huffman + IDCT + 4:2:0 upsampling, restart markers),
    GIF (frame 0, with the TRUE animation frame count reported), and
    netpbm PPM/PGM decode natively; the 8-dim feature vector is computed
    from ACTUAL pixels (channel means, spread, extremes, aspect), so
    identical images embed identically and ``semantic_dedup`` downstream
    finds true visual duplicates.  Formats that still need external
    codec libraries (WebP, inter-frame video, MP3/Ogg audio…)
    raise ``NotImplementedError`` — that seam is ``strict_decode``'s
    contract.
    """
    if payload is None:
        return {"width": None, "height": None, "n_frames": None, "feature": None}
    import numpy as np

    from buildkite_logs_parquet_spark.functions.image_codec import decode_image

    raw = bytes(payload)
    n_frames = 1
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        from buildkite_logs_parquet_spark.functions.gif_codec import decode_gif

        info, frames = decode_gif(raw, frame_indices=[0])
        img = frames[0]
        n_frames = info["n_frames"]
    else:
        img = decode_image(raw)
    return _pixel_features(img, n_frames)


def _pixel_features(img, n_frames: int = 1) -> dict:
    """Shared pixel→features step: 8-dim vector (channel means, spread,
    extremes, aspect) from an HxWxC uint8 array — identical whichever
    codec produced the pixels, so native and external decodes of the
    same image embed identically."""
    import numpy as np

    h, w, ch = img.shape
    px = img.astype("float64")
    gray = px[:, :, :3].mean() if ch >= 3 else px[:, :, 0].mean()
    if ch >= 3:
        r, g, b = (px[:, :, i].mean() for i in range(3))
    else:
        r = g = b = gray
    feature = [
        gray / 255.0,
        float(np.std(px)) / 255.0,
        r / 255.0,
        g / 255.0,
        b / 255.0,
        w / (w + h),
        float(px.min()) / 255.0,
        float(px.max()) / 255.0,
    ]
    return {
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "feature": [round(x, 6) for x in feature],
    }


def strict_decode(payload: bytes) -> dict:
    """The hard codec seam: formats beyond the native set
    (PNG/JPEG/GIF/PPM images, Y4M/MJPEG-AVI video, WAV/FLAC audio)
    — WebP, inter-frame video codecs, MP3/Ogg — need libraries not
    present in this environment.

    MP3 specifically: the STRUCTURE layer is fully native
    (``mp3_frames``/``mp3_split_points``/``mp3_triage`` — side info,
    CRC, bit-reservoir resolution, safe chunk boundaries); only the
    spectral-to-PCM step sits behind this seam, because it requires
    ISO's tabulated Huffman/synthesis-window data that cannot be
    derived from a formula (functions/mp3_codec.py docstring) —
    shipping invented tables would decode to silently wrong samples.

    H.264/MP4 likewise: the STRUCTURE layer is fully native
    (``video_stream_summary``/``video_split_points`` — NAL walk,
    Exp-Golomb SPS geometry, IDR detection, ISO-BMFF sample tables);
    slice-DATA decode (CAVLC/CABAC, prediction, transforms) is the
    full-decoder ask that stays behind this seam."""
    raise NotImplementedError(
        "media decoding beyond the native codec set requires libraries "
        "not present in this environment; pass decode=real_decode, "
        "decode=fake_decode, decode=auto_decode, or your own callable"
    )


# ---------------------------------------------- executor-side dependency
# policy for compressed formats beyond the native codecs
#
# The native decoders (stdlib+numpy) are hermetic and version-pinned by
# the repo itself — they are the DEFAULT because a codec bump must never
# silently change features mid-corpus.  For formats outside the native
# set (WebP, HEIC, MP3/Ogg audio, inter-frame video) the supported
# deployment is an executor-side optional dependency, probed at runtime
# ON the executor (never the driver — driver-side probing lies on
# heterogeneous clusters):
#
# * images → Pillow (``pip install Pillow`` in the executor image)
# * audio/video → left raising; wire your own callable via ``decode=``
#
# ``auto_decode`` implements the policy: native first (deterministic),
# external only where native has no decoder, NotImplementedError with
# the install hint where neither applies.  The probe result is cached
# per executor process.

_PIL_CACHE: list = []  # [module-or-None], memoized per python worker


def _pil():
    if not _PIL_CACHE:
        try:
            from PIL import Image  # type: ignore

            _PIL_CACHE.append(Image)
        except ImportError:
            _PIL_CACHE.append(None)
    return _PIL_CACHE[0]


def external_image_decode(payload: bytes) -> dict:
    """Decode through Pillow, if importable on this executor: any format
    PIL knows (WebP, HEIC-with-plugin, TIFF…) → the same 8-dim pixel
    feature vector as ``real_decode``.  Raises ``NotImplementedError``
    with the dependency hint when Pillow is absent."""
    if payload is None:
        return {"width": None, "height": None, "n_frames": None, "feature": None}
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "external image decode needs Pillow on the executors "
            "(add 'Pillow' to the executor image / --py-files env)"
        )
    import io

    import numpy as np

    with Image.open(io.BytesIO(bytes(payload))) as im:
        n_frames = int(getattr(im, "n_frames", 1))
        rgb = im.convert("RGB")
        arr = np.asarray(rgb, dtype="uint8")
    return _pixel_features(arr, n_frames)


def auto_decode(payload: bytes) -> dict:
    """The policy decoder: native codecs first; for formats the native
    set can't parse, the optional executor-side library; otherwise the
    dependency-hint error.  Use as ``decode=auto_decode`` when the
    corpus mixes native-decodable and exotic formats."""
    try:
        return real_decode(payload)
    except NotImplementedError:
        return external_image_decode(payload)


def attach_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    media_type: str = "image",
    fmt: str | None = None,
    uri_col: str | None = None,
) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            (F.col(uri_col) if uri_col else F.lit(None).cast("string")).alias(
                "source_uri"
            ),
            F.coalesce(F.octet_length(F.col(payload_col)), F.lit(0))
            .cast("long")
            .alias("byte_size"),
        ),
    )


def extract_features(
    media: DataFrame,
    decode: Callable[[bytes], dict] = fake_decode,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` keeps payload bytes executor-local (no driver collect)
    and amortizes Python crossing per Arrow batch.  At 100 TB: payloads are
    large — repartition upstream so a batch of ``batch_size_hint`` rows fits
    executor memory, and select only (media_id, payload) into this stage so
    Tungsten prunes the rest.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                feats = decode(bytes(payload) if payload is not None else None)
                out.append(
                    {
                        "media_id": media_id,
                        "width": feats["width"],
                        "height": feats["height"],
                        "n_frames": feats["n_frames"],
                        "feature": feats["feature"],
                    }
                )
            yield pd.DataFrame(out)

    pruned = media.select("media_id", "payload")
    return pruned.mapInPandas(run, schema=FEATURES_SCHEMA)


def embed_media(
    media: DataFrame,
    dim: int = 64,
    encode: Callable[[bytes], list] | None = None,
) -> DataFrame:
    """Media → embedding column, the bridge from binary payloads into the
    similarity stack (``operators/similarity``): the output schema
    ``(media_id, embedding array<float>)`` is exactly what
    ``cosine_topk`` / ``hyperplane_buckets`` / ``ivf_assign`` consume.

    ``encode`` is the real-model seam (CLIP-style image encoder etc. —
    the libraries are absent from this environment); the default is a
    DETERMINISTIC FAKE — ``dim`` unit-normalized floats seeded from the
    payload's md5 — that keeps every downstream ANN test runnable and
    reproducible.  Same Arrow-batching discipline as
    ``extract_features``: payloads never leave the executors, one Python
    crossing per batch.
    """

    def default_encode(payload: bytes) -> list:
        import hashlib
        import random as _random

        seed = int.from_bytes(
            hashlib.md5(payload or b"").digest()[:8], "big"
        )
        rng = _random.Random(seed)
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = sum(x * x for x in v) ** 0.5 or 1.0
        return [float(x / n) for x in v]

    enc = encode or default_encode

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out.append(
                    {
                        "media_id": media_id,
                        "embedding": enc(
                            bytes(payload) if payload is not None else None
                        ),
                    }
                )
            yield pd.DataFrame(out)

    schema = "media_id long, embedding array<float>"
    return media.select("media_id", "payload").mapInPandas(run, schema=schema)


def audio_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    round_to: int = 6,
) -> DataFrame:
    """REAL audio decode + per-clip signal features over WAV (PCM or IMA
    ADPCM) and FLAC payloads (``functions/audio_codec.decode_audio`` —
    pure stdlib format sniff, the audio twin of the PNG/PPM image path): sample rate, channel/sample counts,
    duration, RMS level and zero-crossing rate of the first channel.

    Undecodable payloads quarantine as NULL-feature rows (``decode_ok``
    false) rather than failing the job — the scanner's quarantine
    discipline applied to media.  Same Arrow-batching shape as
    ``extract_features``: payloads never leave the executors.  Features
    are float64 math rounded to ``round_to`` dp — deterministic per
    payload.
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.audio_codec import (
            decode_audio,
        )

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                row = {
                    id_col: media_id,
                    "decode_ok": False,
                    "sample_rate": None,
                    "n_channels": None,
                    "n_samples": None,
                    "duration_ms": None,
                    "rms": None,
                    "zero_crossing_rate": None,
                }
                try:
                    sr, samples = decode_audio(bytes(payload))
                    mono = samples[:, 0].astype(np.float64) / 32768.0
                    n = len(mono)
                    zc = (
                        float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                        / (n - 1)
                        if n > 1
                        else 0.0
                    )
                    row.update(
                        decode_ok=True,
                        sample_rate=int(sr),
                        n_channels=int(samples.shape[1]),
                        n_samples=int(n),
                        duration_ms=round(1000.0 * n / sr, round_to),
                        rms=round(float(np.sqrt(np.mean(mono**2))) if n else 0.0, round_to),
                        zero_crossing_rate=round(zc, round_to),
                    )
                except Exception:
                    pass
                out.append(row)
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} long, decode_ok boolean, sample_rate int, "
        "n_channels int, n_samples long, duration_ms double, "
        "rms double, zero_crossing_rate double"
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def audio_frame_windows(
    media: DataFrame,
    window_ms: int = 25,
    hop_ms: int = 10,
    id_col: str = "media_id",
    payload_col: str = "payload",
    round_to: int = 6,
) -> DataFrame:
    """Fixed-length analysis windows over decoded WAV payloads — the
    audio analogue of video ``frame_sample_plan``: one row per
    (clip, window) with the window's start offset and RMS, the framing
    every downstream audio featurizer (filterbanks, VAD, ASR chunking)
    starts from.

    Row count multiplies by ~duration/hop — like the video explode,
    repartition AFTER this stage, not before.  Windows shorter than
    ``window_ms`` at the clip tail are dropped (standard framing).
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.audio_codec import (
            decode_audio,
        )

        for pdf in batches:
            ids, idxs, starts, rmss = [], [], [], []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, samples = decode_audio(bytes(payload))
                except Exception:
                    continue
                mono = samples[:, 0].astype(np.float64) / 32768.0
                win = max(int(sr * window_ms / 1000), 1)
                hop = max(int(sr * hop_ms / 1000), 1)
                for k, s in enumerate(range(0, len(mono) - win + 1, hop)):
                    w = mono[s : s + win]
                    ids.append(media_id)
                    idxs.append(k)
                    starts.append(round(1000.0 * s / sr, round_to))
                    rmss.append(round(float(np.sqrt(np.mean(w**2))), round_to))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "window_index": idxs,
                    "start_ms": starts,
                    "rms": rmss,
                }
            )

    schema = f"{id_col} long, window_index int, start_ms double, rms double"
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def frame_sample_plan(
    media: DataFrame, every_nth: int = 2
) -> DataFrame:
    """Video frame-sampling *plan*: expands per-media frame indices to rows
    (the decode of each sampled frame is the stubbed seam).  Demonstrates
    the explode-side partition math: rows multiply by frames/every_nth, so
    repartition after, not before."""
    feats = extract_features(media)
    return feats.select(
        "media_id",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("n_frames") - 1),
                lambda i: i % every_nth == 0,
            )
        ).alias("frame_index"),
    )


def video_frames(
    media: DataFrame,
    every_nth: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
    as_png: bool = True,
) -> DataFrame:
    """REAL video decode + frame sampling over Y4M payloads
    (``functions/video_codec``), MJPEG AVI (``functions/avi_codec`` —
    a genuinely COMPRESSED container, JPEG per frame), and animated
    GIFs (``functions/gif_codec``) — pure stdlib+numpy, the video twin
    of the PNG and WAV paths: every Nth luma frame comes out as its own
    row, re-encoded as a PNG payload by default so sampled frames flow
    STRAIGHT into the image pipeline (``embed_media`` → semantic dedup /
    ANN — one code path for stills and video frames).

    The codec walk skips unselected frames by pointer arithmetic
    (frame sizes are known from the header), so sampling cost is
    O(selected frames) copies.  Arrow-batched ``mapInPandas``; payloads
    never leave the executors; rows multiply by ``n_frames/every_nth``,
    so repartition AFTER this operator, not before (same rule as the
    audio framing op).  Undecodable payloads quarantine as one
    ``decode_ok=false`` row.  Compressed containers (mp4/webm) remain
    the ``strict_decode`` seam.
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.image_codec import (
            encode_png,
        )
        from buildkite_logs_parquet_spark.functions.video_codec import (
            decode_y4m,
            parse_y4m_header,
        )

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                try:
                    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                        # MJPEG AVI: frames are independent JPEGs, so
                        # only the sampled frames are decoded at all
                        from buildkite_logs_parquet_spark.functions.avi_codec import (  # noqa: E501
                            decode_avi_mjpeg,
                        )

                        ainfo, _ = decode_avi_mjpeg(raw, frame_indices=[])
                        picks = list(range(0, ainfo["n_frames"], every_nth))
                        _, rgb_frames = decode_avi_mjpeg(
                            raw, frame_indices=picks
                        )
                        frames = [
                            (
                                0.299 * f[:, :, 0]
                                + 0.587 * f[:, :, 1]
                                + 0.114 * f[:, :, 2]
                            ).astype(np.uint8)
                            if f.shape[2] >= 3
                            else f[:, :, 0]
                            for f in rgb_frames
                        ]
                        n_total = ainfo["n_frames"]
                    elif raw[:6] in (b"GIF87a", b"GIF89a"):
                        # animated GIF rides the same video path: frames
                        # are DELTAS, so the walk is sequential, but only
                        # sampled composites are materialized
                        from buildkite_logs_parquet_spark.functions.gif_codec import (  # noqa: E501
                            decode_gif,
                        )

                        ginfo, _ = decode_gif(raw, frame_indices=[])
                        picks = list(range(0, ginfo["n_frames"], every_nth))
                        _, rgb_frames = decode_gif(raw, frame_indices=picks)
                        gframes = [
                            (
                                0.299 * f[:, :, 0]
                                + 0.587 * f[:, :, 1]
                                + 0.114 * f[:, :, 2]
                            ).astype(np.uint8)
                            for f in rgb_frames
                        ]
                        n_total = ginfo["n_frames"]
                        frames = gframes
                    else:
                        hdr = parse_y4m_header(raw)
                        # count frames cheaply, then decode only the sample
                        hdr2, _ = decode_y4m(raw, frame_indices=[])
                        n_total = hdr2["n_frames"]
                        picks = list(range(0, n_total, every_nth))
                        _, frames = decode_y4m(raw, frame_indices=picks)
                    for fi, luma in zip(picks, frames):
                        out.append(
                            {
                                id_col: media_id,
                                "decode_ok": True,
                                "frame_index": fi,
                                "n_frames": n_total,
                                "height": int(luma.shape[0]),
                                "width": int(luma.shape[1]),
                                "mean_luma": round(
                                    float(np.mean(luma)), 6
                                ),
                                "frame_payload": (
                                    encode_png(luma) if as_png else luma.tobytes()
                                ),
                            }
                        )
                except Exception:
                    out.append(
                        {
                            id_col: media_id,
                            "decode_ok": False,
                            "frame_index": None,
                            "n_frames": None,
                            "height": None,
                            "width": None,
                            "mean_luma": None,
                            "frame_payload": None,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col,
                    "decode_ok",
                    "frame_index",
                    "n_frames",
                    "height",
                    "width",
                    "mean_luma",
                    "frame_payload",
                ],
            )

    schema = (
        f"{id_col} long, decode_ok boolean, frame_index int, "
        "n_frames int, height int, width int, mean_luma double, "
        "frame_payload binary"
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def _dhash64(img) -> int:
    """dHash: gray → 8x9 area-average grid → horizontal gradient sign
    bits, MSB-first row-major → signed 64-bit int (Spark LongType)."""
    import numpy as np

    px = img.astype("float64")
    gray = px[:, :, :3].mean(axis=2) if px.shape[2] >= 3 else px[:, :, 0]
    h, w = gray.shape
    rb = [(r * h) // 8 for r in range(9)]
    cb = [(c * w) // 9 for c in range(10)]
    cells = np.empty((8, 9))
    for r in range(8):
        r0, r1 = rb[r], max(rb[r] + 1, rb[r + 1])
        for c in range(9):
            c0, c1 = cb[c], max(cb[c] + 1, cb[c + 1])
            cells[r, c] = gray[r0:r1, c0:c1].mean()
    bits = (cells[:, :-1] > cells[:, 1:]).reshape(-1)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def perceptual_hash(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual (difference) hash over DECODED pixels: unlike the
    byte-digest exact dedup, two images that differ only by lossy
    re-encoding (the dominant duplication mode in image crawls — same
    picture saved at different JPEG qualities or converted PNG↔JPEG)
    land within a few bits of each other.  Arrow-batched ``mapInPandas``
    through the native codec set; undecodable payloads come out with a
    null hash (the quarantine convention).  Output:
    ``(id, phash long, decode_ok boolean)``."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.image_codec import (
            decode_image,
        )

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    h = _dhash64(decode_image(bytes(payload)))
                    out.append({id_col: mid, "phash": h, "decode_ok": True})
                except Exception:
                    out.append(
                        {id_col: mid, "phash": None, "decode_ok": False}
                    )
            yield pd.DataFrame(out, columns=[id_col, "phash", "decode_ok"])

    return media.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} long, phash long, decode_ok boolean"
    )


def image_near_dups(
    media: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Visual near-duplicate pairs: dHash fingerprints through the SAME
    pigeonhole band join as text SimHash (dedup.simhash_near_duplicates
    at 64 bits) — banded equi-join, never all-pairs, so the pair space
    scales like the text path.  Pairs carry the bit distance; feed them
    into graph.dedup_clusters exactly like text near-dup pairs."""
    from buildkite_logs_parquet_spark.operators.dedup import (
        simhash_near_duplicates,
    )

    prints = (
        perceptual_hash(media, id_col, payload_col)
        .where("decode_ok")
        .select(F.col(id_col), F.col("phash").alias("simhash"))
    )
    return simhash_near_duplicates(
        prints, id_col, max_hamming=max_hamming, bits=64
    )


def pdf_text_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_text_chars: int = 1_000_000,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """REAL PDF text extraction over binary payloads
    (``functions/pdf_text.extract_pdf_text`` — pure stdlib object scan
    + Flate decode + text-operator walk): per document the extracted
    ``text`` (form-feed page joins, capped at ``max_text_chars``),
    ``n_pages``, ``n_chars`` (uncapped count), and the quarantine flag.

    Undecodable payloads (not a PDF, damaged Flate) and encrypted files
    quarantine as ``decode_ok`` false rows — the scanner discipline.
    Same Arrow-batched shape as the other media stages: payloads never
    leave the executors; downstream the ``text`` column feeds the whole
    text-curation surface (normalize → quality → dedup → pack).
    """

    carry = list(carry_cols or [])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.pdf_text import (
            extract_pdf_text,
        )

        cols = [id_col, *carry, "decode_ok", "n_pages", "n_chars", "text"]
        for pdf in batches:
            out = []
            for _, rec in pdf.iterrows():
                row = {
                    id_col: rec[id_col],
                    **{c: rec[c] for c in carry},
                    "decode_ok": False,
                    "n_pages": None,
                    "n_chars": None,
                    "text": None,
                }
                try:
                    text, n_pages = extract_pdf_text(bytes(rec[payload_col]))
                    row.update(
                        decode_ok=True,
                        n_pages=n_pages,
                        n_chars=len(text),
                        text=text[:max_text_chars],
                    )
                except (ValueError, NotImplementedError):
                    pass
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    id_type = media.schema[id_col].dataType.simpleString()
    carry_schema = "".join(
        f", {c} {media.schema[c].dataType.simpleString()}" for c in carry
    )
    schema = (
        f"{id_col} {id_type}{carry_schema}, decode_ok boolean, "
        "n_pages int, n_chars long, text string"
    )
    return media.select(
        F.col(id_col), *[F.col(c) for c in carry], F.col(payload_col)
    ).mapInPandas(run, schema=schema)


def follow_document_dir(
    spark,
    path: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """STREAMING document intake: PDF files AS THEY LAND in a drop
    directory (Structured Streaming ``binaryFile`` source, the
    ``follow_warc_dir`` shape) → the same ``pdf_text_features``
    extraction per micro-batch.  ``media_id`` is derived from the file
    path (stable across restarts — replaying a batch reproduces the
    same ids, so downstream ``stream_append_dedup_against_lake``
    idempotence holds); undecodable files flow in-stream as
    ``decode_ok`` false rows with their path, never a dead executor.

    Compose with the existing streaming sinks exactly like the crawl
    and log-tail sources; the ``text`` column feeds the same curation
    surface the batch path uses."""
    binary = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", int(max_files_per_trigger))
        .option("pathGlobFilter", "*.pdf")
        .load(path)
    )
    media = binary.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("path"),
        F.col("content").alias("payload"),
    )
    # path rides THROUGH the Arrow stage (carry_cols) — a stream-stream
    # self-join to re-attach it would build needless join state
    return pdf_text_features(media, carry_cols=["path"])


def mp3_triage(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Metadata-only MP3 frame-walk (``audio_codec.mp3_info`` — headers,
    never samples): duration/bitrate/layer stats for routing an audio
    crawl before any decode.  Arrow-batched; unparseable payloads
    quarantine as ``parse_ok = false`` rows.  At 100 TB this is the
    cheap full-corpus pass — bytes stay executor-local and the walk is
    O(frames), no DCT/huffman work (full MP3 decode remains the honest
    ``strict_decode`` seam)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.audio_codec import mp3_info

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                row = {
                    id_col: media_id,
                    "parse_ok": False,
                    "n_frames": None,
                    "duration_ms": None,
                    "sample_rate": None,
                    "bitrate_kbps": None,
                    "vbr": None,
                    "layer": None,
                    "mpeg_version": None,
                    "has_id3v2": None,
                }
                try:
                    info = mp3_info(bytes(payload))
                    row.update(parse_ok=True, **{
                        k: info[k]
                        for k in (
                            "n_frames", "duration_ms", "sample_rate",
                            "bitrate_kbps", "vbr", "layer", "mpeg_version",
                            "has_id3v2",
                        )
                    })
                except Exception:
                    pass
                out.append(row)
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} long, parse_ok boolean, n_frames int, duration_ms double, "
        "sample_rate int, bitrate_kbps double, vbr boolean, layer int, "
        "mpeg_version string, has_id3v2 boolean"
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def mp3_frames(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_frames_per_clip: int | None = None,
) -> DataFrame:
    """Full Layer-III STRUCTURE decode (functions/mp3_codec.py — the
    complete ISO side-information parse, CRC-16 verification, and
    bit-reservoir resolution; everything in the stream that is
    algorithmically specified): one row per MPEG frame with the fields
    a large-scale audio pipeline needs BEFORE any PCM work —

    * ``resolved`` — whether the frame's ``main_data_begin`` back
      pointer lands inside the observed reservoir (a clip cut
      mid-reservoir starts with unresolvable frames);
    * ``is_split_point`` — ``main_data_begin == 0``: decoding can start
      here with no history, so these frames are the ONLY safe
      boundaries for chunking a long stream across executors;
    * ``crc_ok`` — protection CRC verdict (null when unprotected);
    * per-granule block types / part2_3 bit budget for triage.

    Arrow-batched ``mapInPandas``; payloads stay executor-local;
    unparseable clips quarantine by absence (pair with ``mp3_triage``
    for the parse_ok audit).  PCM reconstruction itself remains the
    documented ``strict_decode`` seam — it requires ISO's tabulated
    Huffman/window data (mp3_codec module docstring); every operator
    above the seam (fingerprint, features, near-dup) already consumes
    decoded arrays, so wiring a codec library in at deployment changes
    nothing here."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.mp3_codec import (
            parse_xing,
            walk_frames,
        )

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                try:
                    frames = walk_frames(raw, max_frames=max_frames_per_clip)
                except Exception:
                    continue  # quarantine by absence
                xing = parse_xing(raw, frames[0])
                for f in frames:
                    g0 = f.side_info.granules[0][0]
                    out.append(
                        {
                            id_col: media_id,
                            "frame_idx": f.index,
                            "byte_offset": f.offset,
                            "frame_bytes": f.frame_bytes,
                            "sample_rate": f.header.sample_rate,
                            "bitrate_kbps": f.header.bitrate_kbps,
                            "n_channels": f.header.n_channels,
                            "mpeg_version": f.header.version,
                            "main_data_begin": f.side_info.main_data_begin,
                            "part2_3_bits": f.part2_3_bits,
                            "block_type_g0": g0.block_type,
                            "window_switching_g0": g0.window_switching,
                            "crc_ok": f.crc_ok,
                            "resolved": f.resolved,
                            "is_split_point": f.is_split_point,
                            "is_xing_header": bool(xing) and f.index == 0,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col, "frame_idx", "byte_offset", "frame_bytes",
                    "sample_rate", "bitrate_kbps", "n_channels",
                    "mpeg_version", "main_data_begin", "part2_3_bits",
                    "block_type_g0", "window_switching_g0", "crc_ok",
                    "resolved", "is_split_point", "is_xing_header",
                ],
            )

    schema = (
        f"{id_col} long, frame_idx int, byte_offset long, frame_bytes int, "
        "sample_rate int, bitrate_kbps int, n_channels int, "
        "mpeg_version string, main_data_begin int, part2_3_bits int, "
        "block_type_g0 int, window_switching_g0 boolean, crc_ok boolean, "
        "resolved boolean, is_split_point boolean, is_xing_header boolean"
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def mp3_split_points(
    frames: DataFrame,
    id_col: str = "media_id",
) -> DataFrame:
    """Safe parallel-decode boundaries from an ``mp3_frames`` relation:
    the frames where the bit reservoir is empty (``main_data_begin ==
    0``), i.e. where a chunk can start decoding with zero history.  A
    100 TB audio corpus splits long streams at exactly these offsets —
    splitting anywhere else yields frames whose spectral data lives in
    the PREVIOUS chunk.  Pure narrow filter + projection."""
    return frames.where(F.col("is_split_point")).select(
        id_col, "frame_idx", "byte_offset"
    )


def _video_structure(raw: bytes) -> tuple[dict, list[dict]]:
    """Shared container dispatch for the two video operators: sniff ISO
    BMFF (ftyp) vs raw Annex-B H.264, parse the structure ONCE, and
    return (summary fields, split-point rows).  One implementation so a
    detection fix cannot drift between the operators (round-6 review).
    Raises on unparseable payloads — callers quarantine."""
    from buildkite_logs_parquet_spark.functions import h264_codec as H
    from buildkite_logs_parquet_spark.functions import mp4_box as M4

    if raw[4:8] == b"ftyp":
        info = M4.video_track_info(raw)
        idx = M4.sample_index(raw, info.stbl)
        sps = (
            H.parse_sps(H.remove_emulation_prevention(info.sps[0][1:]))
            if info.sps
            else None
        )
        summary = {
            "container": "mp4",
            "codec": info.codec,
            "profile": sps.profile_name if sps else None,
            "level_idc": sps.level_idc if sps else None,
            "width": sps.width if sps else int(info.width),
            "height": sps.height if sps else int(info.height),
            "n_units": len(idx),
            "n_sync": sum(1 for s in idx if s.is_sync),
            "timescale": info.timescale,
        }
        splits = [
            {
                "split_idx": k,
                "byte_offset": s.offset,
                "size": s.size,
                "dts": s.dts,
                "kind": "sync_sample",
            }
            for k, s in enumerate(x for x in idx if x.is_sync)
        ]
        return summary, splits
    si = H.h264_stream_info(raw)
    summary = {
        "container": "annexb",
        "codec": "h264",
        "profile": si.sps.profile_name if si.sps else None,
        "level_idc": si.sps.level_idc if si.sps else None,
        "width": si.sps.width if si.sps else None,
        "height": si.sps.height if si.sps else None,
        "n_units": si.n_nal_units,
        "n_sync": si.n_idr,
        "timescale": None,
    }
    splits = [
        {
            "split_idx": k,
            "byte_offset": off,
            "size": None,
            "dts": None,
            "kind": "idr",
        }
        for k, off in enumerate(si.idr_offsets)
    ]
    return summary, splits


def video_stream_summary(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Container/codec STRUCTURE triage for video payloads — the pass
    that routes a video crawl before any pixel work.  Sniffs ISO BMFF
    (ftyp) vs raw Annex-B H.264 (shared ``_video_structure`` dispatch);
    emits one row per clip with container, codec fourcc / H.264
    profile+level, TRUE coded dimensions (SPS macroblock geometry minus
    cropping — the container's tkhd numbers lie on anamorphic streams),
    sample/NAL counts, and the sync/IDR count that bounds how parallel
    a decode can be.  Unparseable clips quarantine as
    ``parse_ok = false``.  Arrow-batched; payloads stay executor-local.
    Pixel decode remains the ``strict_decode`` seam
    (functions/h264_codec.py docstring: slice DATA needs the full
    CAVLC/CABAC machinery; structure does not)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                row = {
                    id_col: media_id, "parse_ok": False, "container": None,
                    "codec": None, "profile": None, "level_idc": None,
                    "width": None, "height": None, "n_units": None,
                    "n_sync": None, "timescale": None,
                }
                try:
                    summary, _ = _video_structure(bytes(payload))
                    row.update(parse_ok=True, **summary)
                except Exception:
                    pass
                out.append(row)
            yield pd.DataFrame(out, columns=[
                id_col, "parse_ok", "container", "codec", "profile",
                "level_idc", "width", "height", "n_units", "n_sync",
                "timescale",
            ])

    schema = (
        f"{id_col} long, parse_ok boolean, container string, codec string, "
        "profile string, level_idc int, width int, height int, "
        "n_units int, n_sync int, timescale int"
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def video_split_points(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Safe parallel-decode boundaries for video payloads, one row per
    split point: MP4 sync samples (stss — exact byte spans from the
    stsz/stsc/stco resolution) or Annex-B IDR NAL offsets (shared
    ``_video_structure`` dispatch).  Decoding a chunk that starts
    anywhere ELSE hands the decoder a picture whose reference frames
    live in the previous chunk — these rows are the distributed-video
    analogue of ``mp3_split_points``.  Unparseable clips quarantine by
    absence (pair with ``video_stream_summary`` for the audit)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _, splits = _video_structure(bytes(payload))
                except Exception:
                    continue
                for s in splits:
                    out.append({id_col: media_id, **s})
            yield pd.DataFrame(out, columns=[
                id_col, "split_idx", "byte_offset", "size", "dts", "kind",
            ])

    schema = (
        f"{id_col} long, split_idx int, byte_offset long, size long, "
        "dts long, kind string"
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def audio_fingerprint(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_fft: int = 1024,
    hop: int = 512,
    n_bands: int = 33,
    fmin: float = 300.0,
    fmax: float = 3000.0,
) -> DataFrame:
    """Haitsma–Kalker (Philips) audio fingerprint: per analysis frame, a
    32-bit sub-fingerprint whose bit ``b`` is the sign of the
    time-and-band energy difference
    ``(E[t,b]-E[t,b+1]) - (E[t-1,b]-E[t-1,b+1])`` over ``n_bands``
    log-spaced bands — the published robust-hash recipe (Haitsma &
    Kalker, "A Highly Robust Audio Fingerprinting System", ISMIR 2002).
    Invariant to global gain (signs of energy *differences*), robust to
    mild EQ/codec noise.

    Output: one row per frame ``(id, frame_idx, fp)`` with ``fp`` the
    packed 32-bit word as a long.  Decode + windowed rFFT batch inside
    Arrow (numpy stride-tricks framing, vectorized ``rfft`` per clip);
    payloads never reach the driver.  Undecodable clips yield no rows
    (quarantine by absence — pair with ``audio_features.decode_ok`` for
    the audit).  Downstream near-dup join: ``audio_fingerprint_near_dups``.
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.audio_codec import (
            decode_audio,
        )

        for pdf in batches:
            ids, idxs, fps = [], [], []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, samples = decode_audio(bytes(payload))
                except Exception:
                    continue
                mono = samples[:, 0].astype(np.float64)
                if len(mono) < n_fft + hop:
                    continue
                n_frames = 1 + (len(mono) - n_fft) // hop
                frames = np.lib.stride_tricks.as_strided(
                    mono,
                    shape=(n_frames, n_fft),
                    strides=(mono.strides[0] * hop, mono.strides[0]),
                )
                win = np.hanning(n_fft)
                spec = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2
                freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
                hi = min(fmax, sr / 2.0 - 1.0)
                edges = np.geomspace(fmin, hi, n_bands + 1)
                bins = np.searchsorted(freqs, edges)
                energies = np.empty((n_frames, n_bands))
                for b in range(n_bands):
                    lo_b, hi_b = bins[b], max(bins[b + 1], bins[b] + 1)
                    energies[:, b] = spec[:, lo_b:hi_b].sum(axis=1)
                d = energies[:, :-1] - energies[:, 1:]   # band deltas
                dd = d[1:] - d[:-1]                      # time deltas
                bits = (dd > 0).astype(np.uint64)
                words = np.zeros(len(bits), dtype=np.uint64)
                for b in range(bits.shape[1]):
                    words |= bits[:, b] << np.uint64(b)
                ids.extend([media_id] * len(words))
                idxs.extend(range(len(words)))
                fps.extend(int(w) for w in words)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "fp": fps})

    schema = f"{id_col} long, frame_idx int, fp long"
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def audio_fingerprint_near_dups(
    fp_df: DataFrame,
    id_col: str = "media_id",
    max_ber: float = 0.25,
    min_frames: int = 4,
    max_band_df: int = 64,
) -> DataFrame:
    """Near-duplicate audio by fingerprint bit-error-rate (the
    Haitsma–Kalker match criterion): candidate pairs come from a banded
    inverted index — each 32-bit sub-fingerprint splits into two 16-bit
    bands, and two clips sharing ANY (frame_idx, band, half-word) key
    become candidates (the simhash pigeonhole trick per frame — a frame
    with <2 flipped bits always lands a clean band, and across a clip's
    many frames the chance a true near-dup never lands one is
    negligible; 2^16 buckets keep chance collisions rare, unlike byte
    bands whose 256 buckets drift toward all-pairs at fleet scale) —
    then each candidate pair is scored by the mean
    per-aligned-frame Hamming distance / 32 (``bit_count(xor)``,
    JVM-side), keeping pairs with BER <= ``max_ber`` over at least
    ``min_frames`` aligned frames.

    ``max_band_df`` drops band keys shared by more than that many clips
    (silence frames are the audio boilerplate) before the pair join —
    the standard DF cap on the slim projection; scoring joins are plain
    equi-joins on (id, frame_idx).  Never all-pairs.  Output:
    ``(id_a, id_b, n_frames, ber)`` with ``id_a < id_b``.
    """
    fp = fp_df.select(F.col(id_col).alias("id"), "frame_idx", "fp")
    bands = fp.select(
        "id",
        "frame_idx",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("fp", 16 * b)
                        .bitwiseAND(F.lit(65535))
                        .alias("byte"),
                    )
                    for b in range(2)
                ]
            )
        ).alias("bk"),
    ).select(
        "id", "frame_idx", F.col("bk")["band"].alias("band"), F.col("bk")["byte"].alias("byte")
    )
    hot = (
        bands.groupBy("frame_idx", "band", "byte")
        .agg(F.count_distinct("id").alias("_d"))
        .where(F.col("_d") > max_band_df)
        .select("frame_idx", "band", "byte")
    )
    bounded = bands.join(
        F.broadcast(hot), ["frame_idx", "band", "byte"], "left_anti"
    )
    ca = bounded.select(F.col("id").alias("id_a"), "frame_idx", "band", "byte")
    cb = bounded.select(F.col("id").alias("id_b"), "frame_idx", "band", "byte")
    cands = (
        ca.join(cb, ["frame_idx", "band", "byte"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    fa = fp.select(
        F.col("id").alias("id_a"), "frame_idx", F.col("fp").alias("fp_a")
    )
    fb = fp.select(
        F.col("id").alias("id_b"), "frame_idx", F.col("fp").alias("fp_b")
    )
    scored = (
        cands.join(fa, "id_a")
        .join(fb, ["id_b", "frame_idx"])
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("n_frames"),
            F.round(
                F.avg(F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))) / 32.0,
                6,
            ).alias("ber"),
        )
        .where((F.col("n_frames") >= min_frames) & (F.col("ber") <= max_ber))
    )
    return scored.select("id_a", "id_b", "n_frames", "ber")


def image_exif_summary(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-image EXIF curation summary (functions/exif.py): camera
    make/model (device-level dedup keys), orientation, capture time,
    and — the privacy audit — GPS presence and decoded coordinates, so
    a corpus can COUNT location leaks before shipping.  Arrow-batched
    ``mapInPandas``; non-JPEG/corrupt payloads quarantine with
    ``decode_ok = false`` (the module convention)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.exif import parse_exif

        cols = [
            id_col, "make", "model", "orientation", "exif_datetime",
            "has_gps", "gps_lat", "gps_lon", "decode_ok",
        ]
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    s = parse_exif(bytes(payload))
                    out.append(
                        {
                            id_col: mid,
                            "make": s.make,
                            "model": s.model,
                            "orientation": s.orientation,
                            "exif_datetime": s.datetime,
                            "has_gps": s.has_gps,
                            "gps_lat": s.gps_lat,
                            "gps_lon": s.gps_lon,
                            "decode_ok": True,
                        }
                    )
                except Exception:
                    out.append(
                        {
                            id_col: mid,
                            "make": None, "model": None,
                            "orientation": None, "exif_datetime": None,
                            "has_gps": None, "gps_lat": None,
                            "gps_lon": None, "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return media.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} long, make string, model string, orientation int,"
        " exif_datetime string, has_gps boolean, gps_lat double,"
        " gps_lon double, decode_ok boolean",
    )


def strip_image_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Privacy transform: every Exif APP1 segment removed, pixels and
    all other segments byte-identical (functions/exif.strip_exif — the
    all-or-nothing strip that cannot half-leak).  Payloads the walker
    cannot parse pass through UNCHANGED with ``stripped = false``: a
    metadata scrubber must never destroy media it doesn't understand.
    Output mirrors the input schema plus the flag."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.exif import strip_exif

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                try:
                    clean = strip_exif(raw)
                    out.append(
                        {
                            id_col: mid,
                            payload_col: clean,
                            "stripped": clean != raw,
                        }
                    )
                except Exception:
                    out.append(
                        {id_col: mid, payload_col: raw, "stripped": False}
                    )
            yield pd.DataFrame(out, columns=[id_col, payload_col, "stripped"])

    return media.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} long, {payload_col} binary, stripped boolean"
    )


def _resize_area(img, out_h: int, out_w: int):
    """Deterministic box-filter (area-average) resize to exactly
    ``(out_h, out_w)`` — the `_dhash64` grid generalized: output cell
    (r, c) averages the input block between the integer pixel
    boundaries ``⌊r·H/out_h⌋ .. ⌊(r+1)·H/out_h⌋`` (clamped non-empty),
    per channel.  Pure numpy, no interpolation-library dependency, and
    bit-reproducible across platforms (float64 means of uint8 blocks,
    rounded half-up to uint8)."""
    import numpy as np

    px = img.astype("float64")
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    rb = [(r * h) // out_h for r in range(out_h + 1)]
    cb = [(c * w) // out_w for c in range(out_w + 1)]
    out = np.empty((out_h, out_w, ch))
    for r in range(out_h):
        r0, r1 = rb[r], max(rb[r] + 1, rb[r + 1])
        for c in range(out_w):
            c0, c1 = cb[c], max(cb[c] + 1, cb[c + 1])
            out[r, c, :] = px[r0:r1, c0:c1, :].reshape(-1, ch).mean(axis=0)
    return np.floor(out + 0.5).clip(0, 255).astype("uint8")


def resize_images(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    width: int = 64,
    height: int = 64,
    keep_aspect: bool = False,
    out_format: str = "png",
) -> DataFrame:
    """Batch image resize — the multimodal preprocessing step every
    vision-data pipeline runs before embedding/training (brief §multimodal:
    decode / feature-extract / RESIZE / frame-sample): decode through
    the native codec set, deterministic area-average downscale, and
    re-encode, all inside Arrow-batched ``mapInPandas``.

    ``keep_aspect`` fits the image inside ``width × height`` preserving
    aspect (never upscales a side's share); otherwise the output is
    exactly ``width × height``.  ``out_format``: ``png`` (lossless,
    stdlib zlib) or ``bmp`` (fastest).  Undecodable payloads come out
    with a NULL payload and ``decode_ok = false`` (the quarantine
    convention) instead of failing the job.

    Output: ``(id, payload binary, out_w, out_h, in_w, in_h,
    decode_ok)``.

    100 TB shape: pure per-row work inside ``mapInPandas`` — repartition
    upstream to spread decode across cores (the ``extract_features``
    guidance); payload bytes never reach the driver.
    """
    if out_format not in ("png", "bmp"):
        raise ValueError("out_format must be png | bmp")
    if width < 1 or height < 1:
        raise ValueError("width/height must be >= 1")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from buildkite_logs_parquet_spark.functions.image_codec import (
            decode_image,
            encode_bmp,
            encode_png,
        )

        enc = encode_png if out_format == "png" else encode_bmp
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = decode_image(bytes(payload))
                    ih, iw = img.shape[0], img.shape[1]
                    ow, oh = width, height
                    if keep_aspect:
                        # largest size fitting the box with aspect
                        # preserved — integer floor arithmetic, ≥ 1px;
                        # cross-multiplied comparison avoids any float
                        if iw * height > ih * width:  # wider than the box
                            ow, oh = width, max(1, (ih * width) // iw)
                        else:
                            ow, oh = max(1, (iw * height) // ih), height
                    small = _resize_area(img, oh, ow)
                    out.append(
                        {
                            id_col: mid,
                            payload_col: bytearray(enc(small)),
                            "out_w": ow,
                            "out_h": oh,
                            "in_w": iw,
                            "in_h": ih,
                            "decode_ok": True,
                        }
                    )
                except Exception:
                    out.append(
                        {
                            id_col: mid,
                            payload_col: None,
                            "out_w": None,
                            "out_h": None,
                            "in_w": None,
                            "in_h": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col, payload_col, "out_w", "out_h", "in_w", "in_h",
                    "decode_ok",
                ],
            )

    return media.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} long, {payload_col} binary, out_w int, out_h int, "
        "in_w int, in_h int, decode_ok boolean",
    )
