"""Pure-stdlib Y4M (YUV4MPEG2) codec — the video twin of
``image_codec`` (PNG/PPM) and ``audio_codec`` (PCM WAV): a REAL decode
path behind the multimodal seam built only from public,
always-available pieces (bytes + numpy), so frame sampling and
per-frame features run on genuine video bytes without ffmpeg.

Y4M is the uncompressed interchange format every video toolchain can
emit (``ffmpeg -f yuv4mpeg2``): an ASCII stream header
(``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``), then per frame a
``FRAME...\\n`` marker followed by the raw planar YUV bytes.  Only 4:2:0
(the default, ``C420``-family) and 4:4:4 subsampling are handled;
compressed containers (mp4/webm/…) remain the honest ``strict_decode``
seam in ``operators/multimodal``.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def _plane_sizes(w: int, h: int, cs: str) -> tuple[int, int, int]:
    y = w * h
    if cs.startswith("C420") or cs == "":
        return y, (w // 2) * (h // 2), (w // 2) * (h // 2)
    if cs.startswith("C444"):
        return y, y, y
    raise ValueError(f"unsupported Y4M colourspace: {cs}")


def parse_y4m_header(data: bytes) -> dict:
    """Parse the stream header: width/height/fps/colourspace + the byte
    offset where frames begin."""
    nl = data.find(b"\n")
    if nl == -1 or not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    fields = data[len(_MAGIC) : nl].split()
    out = {"colourspace": "", "fps_num": 0, "fps_den": 1}
    for f in fields:
        tag, val = chr(f[0]), f[1:].decode("ascii", "replace")
        if tag == "W":
            out["width"] = int(val)
        elif tag == "H":
            out["height"] = int(val)
        elif tag == "F":
            num, den = val.split(":")
            out["fps_num"], out["fps_den"] = int(num), int(den)
        elif tag == "C":
            out["colourspace"] = "C" + val
    if "width" not in out or "height" not in out:
        raise ValueError("Y4M header missing W/H")
    out["frames_offset"] = nl + 1
    return out


def decode_y4m(
    data: bytes, frame_indices: list[int] | None = None
) -> tuple[dict, list[np.ndarray]]:
    """Decode a Y4M payload to ``(header, frames)`` where each frame is
    the LUMA plane as a ``(height, width)`` uint8 array (the channel
    every sampling/feature pipeline wants; chroma is parsed past, not
    returned).  ``frame_indices`` selects frames without materializing
    the rest — the codec walk is a pointer skip over known-size frames,
    so sampling every Nth frame costs O(frames) header reads and
    O(selected) copies.
    """
    hdr = parse_y4m_header(data)
    ysz, usz, vsz = _plane_sizes(
        hdr["width"], hdr["height"], hdr["colourspace"]
    )
    want = set(frame_indices) if frame_indices is not None else None
    frames: list[np.ndarray] = []
    pos = hdr["frames_offset"]
    idx = 0
    n = len(data)
    while pos < n:
        nl = data.find(b"\n", pos)
        if nl == -1 or not data[pos : pos + 5] == b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        body = nl + 1
        if body + ysz + usz + vsz > n:
            raise ValueError(f"truncated frame {idx} at byte {body}")
        if want is None or idx in want:
            luma = np.frombuffer(data[body : body + ysz], np.uint8).reshape(
                hdr["height"], hdr["width"]
            )
            frames.append(luma.copy())
        pos = body + ysz + usz + vsz
        idx += 1
    hdr["n_frames"] = idx
    return hdr, frames


def encode_y4m(frames: list[np.ndarray], fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode luma-only frames as 4:2:0 Y4M (neutral chroma) — the test
    fixture generator; round-trips through ``decode_y4m``."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n".encode()
    )
    chroma = bytes([128]) * ((w // 2) * (h // 2))
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("inconsistent frame shapes")
        out += b"FRAME\n"
        out += np.asarray(fr, np.uint8).tobytes()
        out += chroma + chroma
    return bytes(out)
