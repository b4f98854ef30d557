"""Pure-stdlib MJPEG-in-AVI codec — a real COMPRESSED video container
behind the multimodal seam.

Y4M (``video_codec``) covers raw interchange video; real crawl video is
containerized and compressed.  Motion-JPEG in AVI is the one such
format this repo can implement honestly from public specifications
alone (the Microsoft RIFF/AVI container layout plus T.81 JPEG, already
implemented in the sibling ``jpeg_codec``): every frame is an
independent JPEG, so the container walk is pointer arithmetic and the
per-frame decode reuses ``decode_jpeg`` — including progressive scans.
Inter-frame codecs (H.264/VP9/AV1) remain the ``strict_decode`` seam.

Container layout handled:

* ``RIFF('AVI ')`` with ``LIST('hdrl')`` — ``avih`` main header and one
  ``LIST('strl')`` video stream (``strh`` fccType ``vids``, handler
  ``MJPG``; ``strf`` BITMAPINFOHEADER),
* ``LIST('movi')`` — ``00dc``/``00db`` chunks, one complete JPEG each,
  word-aligned per RIFF rules,
* optional ``idx1`` ignored (the movi walk is self-describing).

Because frames are INDEPENDENT (unlike GIF deltas), ``frame_indices``
selection decodes only the picked frames — the walk skips unselected
chunks by their declared sizes, the same O(selected) cost contract as
Y4M.

A matching writer exists so tests can round-trip: MJPEG is JPEG per
frame, so AVI-extracted frames must decode BIT-IDENTICALLY to the same
JPEG bytes decoded directly.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunks(data: bytes, start: int, end: int):
    """Yield ``(fourcc, payload_start, payload_size)`` over a RIFF chunk
    run, honoring word alignment."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi(data: bytes) -> dict:
    """Header walk: width/height/fps/n_frames plus the offsets+sizes of
    every video frame chunk in ``movi`` — no frame decode."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream (bad RIFF/AVI header)")
    info: dict = {
        "width": None,
        "height": None,
        "usec_per_frame": None,
        "handler": None,
        "frames": [],  # (offset, size) of each 00dc/00db payload
    }
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    for fourcc, p, size in _chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = data[p : p + 4]
        if ltype == b"hdrl":
            for cc, q, qs in _chunks(data, p + 4, p + size):
                if cc == b"avih" and qs >= 40:
                    (uspf,) = struct.unpack("<I", data[q : q + 4])
                    w, h = struct.unpack("<II", data[q + 32 : q + 40])
                    info["usec_per_frame"] = uspf
                    info["width"], info["height"] = int(w), int(h)
                elif cc == b"LIST" and data[q : q + 4] == b"strl":
                    for sc, r, rs in _chunks(data, q + 4, q + qs):
                        if sc == b"strh" and rs >= 8:
                            if data[r : r + 4] == b"vids":
                                info["handler"] = data[r + 4 : r + 8].decode(
                                    "ascii", errors="replace"
                                )
        elif ltype == b"movi":
            for cc, q, qs in _chunks(data, p + 4, p + size):
                if cc[2:4] in (b"dc", b"db"):
                    info["frames"].append((q, qs))
    info["n_frames"] = len(info["frames"])
    if info["width"] is None:
        raise ValueError("AVI: no avih main header found")
    return info


def decode_avi_mjpeg(
    data: bytes, frame_indices: list[int] | None = None
) -> tuple[dict, list[np.ndarray]]:
    """AVI bytes → ``(info, frames)`` of uint8 (H, W, C) arrays.
    ``frame_indices`` decodes ONLY the picked frames (frames are
    independent JPEGs); ``[]`` is a header/count-only walk."""
    from buildkite_logs_parquet_spark.functions.jpeg_codec import decode_jpeg

    info = parse_avi(data)
    if info["handler"] not in (None, "MJPG", "mjpg", "dmb1"):
        raise NotImplementedError(
            f"AVI: codec {info['handler']!r} not supported (MJPEG only)"
        )
    picks = (
        range(info["n_frames"]) if frame_indices is None else frame_indices
    )
    frames: list[np.ndarray] = []
    for fi in picks:
        off, size = info["frames"][fi]
        payload = data[off : off + size]
        if payload[:2] != b"\xff\xd8":
            raise ValueError(f"AVI: frame {fi} is not a JPEG stream")
        frames.append(decode_jpeg(payload))
    return info, frames


def encode_avi_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
) -> bytes:
    """Wrap already-encoded JPEG byte strings as a minimal MJPEG AVI
    (the test-grade writer twin of ``decode_avi_mjpeg``)."""
    if not jpeg_frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    n = len(jpeg_frames)
    max_size = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX off, AVIF_WASCAPTUREFILE-ish
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale / dwRate
            0,  # dwStart
            n,  # dwLength
            max_size,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)
