"""Pure-stdlib+numpy image codec for the multimodal decode seam.

The container ships no media libraries (no PIL/ffmpeg), so the "real
decoder" the multimodal pipeline needs is implemented here from the
public format specifications alone:

* **PNG** (RFC 2083 / W3C PNG spec): signature + chunk walk, zlib
  inflate of the IDAT stream, per-scanline unfiltering (all five filter
  types: None/Sub/Up/Average/Paeth), 8-bit depth, color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced.
  A matching encoder (any per-row filter choice) exists so tests can
  round-trip bit-exactly through every unfilter path.
* **PPM/PGM** (netpbm P6/P5, maxval 255); **BMP** (BI_RGB 8/24/32-bit,
  bottom-up/top-down, palette).
* **GIF** (87a/89a incl. animation) — full decoder + test encoder in the
  sibling ``gif_codec`` module; ``decode_image`` returns frame 0.
* **JPEG** (baseline sequential DCT, T.81) — full decoder + test
  encoder in the sibling ``jpeg_codec`` module; ``decode_image`` sniffs
  the SOI marker and dispatches.

Anything else (WebP, AVIF, TIFF, …) still raises
``NotImplementedError`` — the honest codec seam remains for formats
this repo has not implemented from spec.

This is a reference-grade decoder: per-scanline Python loops for the
sequential filters (Sub/Average/Paeth are inherently serial per byte).
At 100 TB the per-image cost rides inside the Arrow-batched
``mapInPandas`` stage (operators/multimodal.py), so throughput scales
with executors; swap a C-backed codec into the same seam for raw speed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(left: int, up: int, upleft: int) -> int:
    p = left + up - upleft
    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
    if pa <= pb and pa <= pc:
        return left
    if pb <= pc:
        return up
    return upleft


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Palette images are expanded to RGB.  Raises ``ValueError`` on a
    malformed stream and ``NotImplementedError`` for interlaced or
    non-8-bit images (valid PNG, out of this decoder's scope).
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG stream (bad signature)")
    pos = 8
    idat = b""
    palette = None
    header = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if header is None:
        raise ValueError("PNG stream has no IHDR chunk")
    width, height, depth, color, comp, filt, interlace = header
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace != 0:
        raise NotImplementedError("PNG: Adam7 interlacing not supported")
    if depth != 8:
        raise NotImplementedError(f"PNG: bit depth {depth} not supported")
    if color not in _CHANNELS_BY_COLOR_TYPE:
        raise ValueError(f"PNG: invalid color type {color}")
    channels = _CHANNELS_BY_COLOR_TYPE[color]
    stride = width * channels
    raw = zlib.decompress(idat)
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG: decompressed size does not match dimensions")
    out = np.empty((height, stride), np.uint8)
    bpp = channels
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], np.uint8).copy()
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up — vectorized, uint8 wraps mod 256
            rec = line + prev
        elif ftype == 1:  # Sub
            rec = line
            for i in range(bpp, stride):
                rec[i] = (int(rec[i]) + int(rec[i - bpp])) & 0xFF
        elif ftype == 3:  # Average
            rec = line
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                upleft = int(prev[i - bpp]) if i >= bpp else 0
                rec[i] = (int(line[i]) + _paeth(left, int(prev[i]), upleft)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = rec
    img = out.reshape(height, width, channels)
    if color == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE chunk")
        img = palette[img[:, :, 0]]
    return img


def _filter_row(
    line: np.ndarray, prev: np.ndarray, bpp: int, ftype: int
) -> np.ndarray:
    """Forward PNG filter (encoder side) — exact inverse of the decoder."""
    stride = len(line)
    out = np.empty(stride, np.uint8)
    for i in range(stride):
        x = int(line[i])
        left = int(line[i - bpp]) if i >= bpp else 0
        up = int(prev[i])
        upleft = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[i] = (x - pred) & 0xFF
    return out


def encode_png(img: np.ndarray, row_filters: list[int] | None = None) -> bytes:
    """uint8 array (H, W) or (H, W, {1,3,4}) → PNG bytes.

    ``row_filters`` selects the per-scanline filter type (default all 0);
    passing mixed filters lets tests drive every decoder unfilter path.
    """
    arr = np.asarray(img, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color = {1: 0, 3: 2, 4: 6}[channels]
    flat = arr.reshape(height, width * channels)
    filters = row_filters or [0] * height
    if len(filters) != height:
        raise ValueError("row_filters must have one entry per scanline")
    body = bytearray()
    prev = np.zeros(width * channels, np.uint8)
    for y in range(height):
        body.append(filters[y])
        body += _filter_row(flat[y], prev, channels, filters[y]).tobytes()
        prev = flat[y]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )


def decode_ppm(data: bytes) -> np.ndarray:
    """netpbm P6 (RGB) / P5 (gray) bytes → uint8 (H, W, channels)."""
    if data[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM stream")
    channels = 3 if data[:2] == b"P6" else 1
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError("PPM/PGM: only maxval 255 supported")
    n = width * height * channels
    pixels = np.frombuffer(data[pos : pos + n], np.uint8)
    if len(pixels) != n:
        raise ValueError("PPM/PGM: truncated pixel data")
    return pixels.reshape(height, width, channels).copy()


def decode_bmp(data: bytes) -> np.ndarray:
    """Windows BMP (BITMAPINFOHEADER, uncompressed BI_RGB) → uint8
    (H, W, 3): 24/32-bit truecolor (BGR[A] to RGB) and 8-bit palette;
    bottom-up or top-down row order, 4-byte row padding."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream (missing BM magic)")
    (offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP: pre-BITMAPINFOHEADER cores")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bits = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise NotImplementedError(f"BMP: compression {compression}")
    top_down = h < 0
    h = abs(h)
    if bits == 8:
        (used,) = struct.unpack("<I", data[46:50])
        n_pal = used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * n_pal], np.uint8
        ).reshape(-1, 4)[:, 2::-1]  # BGRA -> RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            data[offset : offset + stride * h], np.uint8
        ).reshape(h, stride)[:, :w]
        img = pal[rows]
    elif bits in (24, 32):
        ch = bits // 8
        stride = (w * ch + 3) & ~3
        rows = np.frombuffer(
            data[offset : offset + stride * h], np.uint8
        ).reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
        img = rows[:, :, 2::-1]  # BGR(A) -> RGB
    else:
        raise NotImplementedError(f"BMP: {bits}-bit pixels")
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → 24-bit bottom-up BMP bytes (test twin)."""
    arr = np.asarray(img, np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp needs (H, W, 3) RGB")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    pixels = body.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 54)
    return head + info + pixels


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode: PNG, baseline JPEG, or PPM/PGM → uint8
    (H, W, channels)."""
    if data[:8] == PNG_SIGNATURE:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from buildkite_logs_parquet_spark.functions.jpeg_codec import (
            decode_jpeg,
        )

        return decode_jpeg(data)
    if data[:2] in (b"P6", b"P5"):
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from buildkite_logs_parquet_spark.functions.gif_codec import (
            decode_gif,
        )

        _info, frames = decode_gif(data, frame_indices=[0])
        return frames[0]
    raise NotImplementedError(
        "unsupported image format (PNG, JPEG, GIF, and PPM/PGM decode "
        "natively; other formats need codec libraries not present in this "
        "environment)"
    )
