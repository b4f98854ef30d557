"""Pure-stdlib+numpy GIF codec for the multimodal decode seam.

GIF is the third big real-crawl image format (after JPEG and PNG), and
the container ships no media libraries — so, like the sibling
``jpeg_codec`` / ``image_codec`` modules, the codec is implemented here
from the public specification alone (GIF89a specification, CompuServe
1990; GIF87a subset):

* header + Logical Screen Descriptor, global/local color tables,
* LZW decompression (variable 3-12 bit codes, LSB-first bitstream,
  clear/EOI codes, dictionary growth + reset, the KwKwK case),
* interlaced row order (the 8/8, 8/4, 4/2, 2/1 four-pass scheme),
* GIF89a extensions: Graphic Control (per-frame delay, transparency
  index, disposal methods 0-3 incl. restore-to-background and
  restore-to-previous), other extension blocks skipped by sub-block
  framing,
* animation: frames composite onto the logical-screen canvas at their
  (left, top) offsets, so ``decode_gif`` returns full-canvas RGB frames
  ready for the image pipeline.

A matching encoder (real LZW compression with dictionary reset,
optional interlace, animation with per-frame GCE, transparency) exists
so tests can round-trip bit-exactly — GIF is lossless over palette
pixels, so encode→decode equality is exact, unlike JPEG.

Reference-grade performance: the LZW loop is per-code Python; at 100 TB
the per-image cost rides inside the Arrow-batched ``mapInPandas``
decode stage (operators/multimodal.py), so throughput scales with
executors; swap a C-backed codec into the same seam for raw speed.
"""

from __future__ import annotations

import struct

import numpy as np

#: interlace passes: (first row, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    order: list[int] = []
    for first, step in _INTERLACE_PASSES:
        order.extend(range(first, height, step))
    return order


# ------------------------------------------------------------------ LZW


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF LZW: LSB-first variable-width codes over the concatenated
    sub-block data.  Stops after ``n_pixels`` indices or the EOI code."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # LSB-first bit reader state
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def reset() -> tuple[list[bytes], int]:
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out += entry
        prev = entry
        # widen when the table fills the current code space (cap 12 bits)
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Real GIF LZW compression: dictionary of byte-strings, clear code
    up front, reset when the table tops out at 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def write_code(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    write_code(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        write_code(table[w], width)
        table[wk] = next_code
        next_code += 1
        # the DECODER widens after appending its next entry, i.e. when
        # next_code reaches the code-space size — mirror that here
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4097:  # table full: reset
            write_code(clear, width)
            table, next_code, width = reset()
        w = bytes([b])
    if w:
        write_code(table[w], width)
    write_code(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    """Chunk into ≤255-byte sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF: unterminated sub-block sequence")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if pos + n > len(data):
            raise ValueError("GIF: truncated sub-block")
        pos += n


# ---------------------------------------------------------------- decode


def decode_gif(
    data: bytes, frame_indices: list[int] | None = None
) -> tuple[dict, list[np.ndarray]]:
    """GIF bytes → ``(info, frames)``: full-canvas uint8 RGB frames
    composited per the animation rules (offsets, transparency, disposal
    methods).  ``frame_indices`` selects which composited frames to
    MATERIALIZE (all frames must still be walked — GIF frames are
    deltas, unlike Y4M's fixed-size seekable frames); ``[]`` walks
    headers only and fills ``info['n_frames']``.

    ``info`` carries width/height/n_frames/loop delays.  Raises
    ``ValueError`` on malformed streams.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream (bad signature)")
    w, h, flags, bg_idx, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    bg_rgb = canvas[0, 0].copy()

    info: dict = {"width": int(w), "height": int(h), "delays_cs": []}
    frames: list[np.ndarray] = []
    frame_no = 0
    # pending Graphic Control Extension state
    transparent: int | None = None
    disposal = 0
    delay = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                body, pos = _read_sub_blocks(data, pos)
                if len(body) >= 4:
                    gflags = body[0]
                    delay = struct.unpack("<H", body[1:3])[0]
                    transparent = body[3] if gflags & 1 else None
                    disposal = (gflags >> 2) & 7
            else:  # comment / plain text / application — skip
                _, pos = _read_sub_blocks(data, pos)
            continue
        if block != 0x2C:  # image descriptor
            raise ValueError(f"GIF: unknown block 0x{block:02x} at {pos - 1}")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 7)
            ct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF: image with no color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = np.frombuffer(
            bytes(_lzw_decode(min_code, lzw, fw * fh)), np.uint8
        )
        if len(idx) < fw * fh:
            raise ValueError("GIF: LZW output short of frame size")
        idx = idx[: fw * fh].reshape(fh, fw)
        if iflags & 0x40:  # interlaced: undo the four-pass row order
            un = np.empty_like(idx)
            un[_interlace_order(fh)] = idx
            idx = un
        if int(idx.max()) >= len(ct):
            raise ValueError("GIF: pixel index outside color table")
        rgb = ct[idx]

        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb

        if frame_indices is None or frame_no in frame_indices:
            frames.append(canvas.copy())
        info["delays_cs"].append(delay)
        frame_no += 1

        if disposal == 2:  # restore rect to background
            canvas[top : top + fh, left : left + fw] = bg_rgb
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        transparent = None
        disposal = 0
        delay = 0

    info["n_frames"] = frame_no
    return info, frames


# ---------------------------------------------------------------- encode


def encode_gif(
    frames: list[np.ndarray],
    delays_cs: list[int] | None = None,
    interlace: bool = False,
    transparent_rgb: tuple[int, int, int] | None = None,
    disposals: list[int] | None = None,
) -> bytes:
    """uint8 (H, W, 3) RGB frames → GIF89a bytes (GIF87a shape for one
    frame with no extras).  A shared palette is built from the frames'
    distinct colors (≤256 required — this is a test-grade encoder, not a
    quantizer).  ``transparent_rgb`` pixels are coded as a transparent
    index; ``disposals[i]`` sets each frame's disposal method."""
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w = frames[0].shape[:2]
    stack = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette = np.unique(stack, axis=0)
    trans_idx: int | None = None
    if transparent_rgb is not None:
        t = np.array(transparent_rgb, np.uint8)
        if not (palette == t).all(axis=1).any():
            palette = np.concatenate([palette, t[None]])
        trans_idx = int(np.where((palette == t).all(axis=1))[0][0])
    if len(palette) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    # color table size must be a power of two, minimum 2
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), np.uint8)
    table[: len(palette)] = palette
    lut = {tuple(int(v) for v in c): i for i, c in enumerate(palette)}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7) | 0x70, 0, 0)
    out += table.tobytes()

    min_code = max(2, bits)
    for fi, frame in enumerate(frames):
        if frame.shape[:2] != (h, w):
            raise ValueError("encode_gif: frames must share dimensions")
        disposal = disposals[fi] if disposals else 0
        if len(frames) > 1 or trans_idx is not None or disposal:
            delay = delays_cs[fi] if delays_cs else 4
            gflags = (disposal & 7) << 2
            if trans_idx is not None:
                gflags |= 1
            out += bytes([0x21, 0xF9])
            out += _sub_blocks(
                bytes([gflags])
                + struct.pack("<H", delay)
                + bytes([trans_idx or 0])
            )
        iflags = 0x40 if interlace else 0
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        idx = np.array(
            [lut[tuple(int(v) for v in px)] for px in frame.reshape(-1, 3)],
            np.uint8,
        ).reshape(h, w)
        if interlace:
            idx = idx[_interlace_order(h)]
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(min_code, idx.tobytes()))
    out += b"\x3b"
    return bytes(out)
