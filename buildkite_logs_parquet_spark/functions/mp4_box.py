"""ISO BMFF (MP4) container walker — from the public ISO/IEC 14496-12
box layout.  Pure structure, no codec work: the sample tables are what
a distributed video pipeline needs to CHUNK an MP4 without decoding it.

* :func:`walk_boxes` — the size/type tree (64-bit largesize form
  handled), depth-first with offsets;
* :func:`video_track_info` — the first video track's codec fourcc,
  dimensions from ``tkhd``/``stsd``, and the ``avcC`` SPS/PPS blobs
  (handed to ``h264_codec.parse_sps`` for profile/level/true geometry);
* :func:`sample_index` — the full sample-to-byte-range resolution:
  ``stsz`` (sizes) ⊕ ``stsc`` (samples-per-chunk runs) ⊕ ``stco``/
  ``co64`` (chunk offsets) ⊕ ``stss`` (sync samples) ⊕ ``stts`` (time
  deltas) → one record per sample with its exact byte span, timestamp,
  and keyframe flag.  Sync samples are the ONLY safe split points —
  the container-level analogue of h264_codec's IDR boundaries (for AVC
  tracks they coincide by construction: muxers mark IDR samples sync).

Serializer twin (:func:`build_minimal_mp4`) so tests round-trip
constructed field vectors instead of trusting opaque fixtures.

Reference parity note: no video/container path exists in the reference
repo; this extends the brief-mandated multimodal tier.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

#: boxes that contain other boxes (the walk recurses into these)
CONTAINER_BOXES = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf",
    b"mvex", b"moof", b"traf",
}


@dataclass
class Box:
    offset: int
    size: int  # total, header included
    type: bytes
    payload_offset: int
    children: list["Box"]

    def find(self, *path: bytes) -> "Box | None":
        """First descendant along a type path (e.g. ``find(b'trak',
        b'mdia')``)."""
        if not path:
            return self
        for c in self.children:
            if c.type == path[0]:
                hit = c.find(*path[1:])
                if hit is not None:
                    return hit
        return None

    def find_all(self, t: bytes) -> list["Box"]:
        return [c for c in self.children if c.type == t]


def walk_boxes(data: bytes, start: int = 0, end: int | None = None) -> list[Box]:
    """Parse the box tree in ``data[start:end]``.  Tolerates a truncated
    final box (returned with its declared size, not parsed into);
    raises ValueError on a size that cannot be a box (< 8 and not 0/1)."""
    end = len(data) if end is None else end
    out: list[Box] = []
    pos = start
    while pos + 8 <= end:
        size32, btype = struct.unpack_from(">I4s", data, pos)
        header = 8
        if size32 == 1:
            if pos + 16 > end:
                break
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            header = 16
        elif size32 == 0:
            size = end - pos  # box extends to EOF
        else:
            size = size32
        if size < header:
            raise ValueError(f"impossible box size {size} at {pos}")
        payload_off = pos + header
        kids: list[Box] = []
        if btype in CONTAINER_BOXES and payload_off + 8 <= min(pos + size, end):
            kids = walk_boxes(data, payload_off, min(pos + size, end))
        out.append(Box(pos, size, btype, payload_off, kids))
        pos += size
    return out


def _full_box(data: bytes, box: Box) -> int:
    """Skip the FullBox version/flags dword; returns the field offset."""
    return box.payload_offset + 4


@dataclass
class VideoTrackInfo:
    codec: str  # fourcc of the sample entry (avc1, hvc1, mp4v, …)
    width: int
    height: int
    timescale: int
    sps: list[bytes]
    pps: list[bytes]
    stbl: Box | None


def video_track_info(data: bytes) -> VideoTrackInfo:
    """First video track's codec/geometry + avcC parameter sets.  Video
    detection = handler type ``vide`` in ``hdlr``.  Raises ValueError
    when no video track exists (quarantine seam)."""
    roots = walk_boxes(data)
    moov = next((b for b in roots if b.type == b"moov"), None)
    if moov is None:
        raise ValueError("no moov box")
    for trak in moov.find_all(b"trak"):
        mdia = trak.find(b"mdia")
        if mdia is None:
            continue
        hdlr = mdia.find(b"hdlr")
        if hdlr is None:
            continue
        handler = data[_full_box(data, hdlr) + 4 : _full_box(data, hdlr) + 8]
        if handler != b"vide":
            continue
        mdhd = mdia.find(b"mdhd")
        timescale = 0
        if mdhd is not None:
            version = data[mdhd.payload_offset]
            ts_off = mdhd.payload_offset + 4 + (16 if version == 1 else 8)
            (timescale,) = struct.unpack_from(">I", data, ts_off)
        stbl = mdia.find(b"minf", b"stbl")
        if stbl is None:
            raise ValueError("video track has no sample table")
        stsd = stbl.find(b"stsd")
        codec = "?"
        width = height = 0
        sps: list[bytes] = []
        pps: list[bytes] = []
        if stsd is not None:
            entry_off = _full_box(data, stsd) + 4  # past entry_count
            (esize, etype) = struct.unpack_from(">I4s", data, entry_off)
            codec = etype.decode("latin-1")
            # VisualSampleEntry: 6 reserved + 2 data_ref + 16 predefined
            # + width(2) height(2) at offset 24/26 past the entry header
            width, height = struct.unpack_from(">HH", data, entry_off + 8 + 24)
            # avcC lives among the entry's trailing boxes
            sub = walk_boxes(
                data, entry_off + 8 + 78, entry_off + esize
            )
            for b in sub:
                if b.type == b"avcC":
                    sps, pps = _parse_avcc(data, b)
        return VideoTrackInfo(codec, width, height, timescale, sps, pps, stbl)
    raise ValueError("no video track")


def _parse_avcc(data: bytes, box: Box) -> tuple[list[bytes], list[bytes]]:
    """AVCDecoderConfigurationRecord → raw SPS/PPS NAL payloads."""
    p = box.payload_offset
    n_sps = data[p + 5] & 0x1F
    q = p + 6
    sps = []
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", data, q)
        sps.append(data[q + 2 : q + 2 + ln])
        q += 2 + ln
    n_pps = data[q]
    q += 1
    pps = []
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", data, q)
        pps.append(data[q + 2 : q + 2 + ln])
        q += 2 + ln
    return sps, pps


@dataclass
class SampleRecord:
    sample: int  # 1-based sample number
    offset: int  # absolute byte offset in the file
    size: int
    dts: int  # decode timestamp in track timescale units
    is_sync: bool


def sample_index(data: bytes, stbl: Box) -> list[SampleRecord]:
    """Resolve the stbl tables into one record per sample — the
    chunkable byte map of the track.

    The stsc walk is the only subtle part: each entry
    ``(first_chunk, samples_per_chunk)`` describes a RUN of chunks
    until the next entry's first_chunk; sample offsets within a chunk
    accumulate the preceding samples' stsz sizes."""
    def _entry_table(box: Box, elem: int, fmt: str) -> list[int]:
        # the declared count must fit the BOX payload, not merely the
        # file: unpack_from alone happily reads past the box end into
        # neighboring boxes (silently fabricating offsets from foreign
        # bytes) and raises struct.error — not this module's documented
        # ValueError quarantine seam — only at EOF
        (count,) = struct.unpack_from(">I", data, _full_box(data, box))
        base = _full_box(data, box) + 4
        if base + elem * count > box.offset + box.size:
            raise ValueError(
                f"{box.type.decode('latin-1')} declares {count} entries "
                f"beyond its box payload"
            )
        return list(struct.unpack_from(f">{count}{fmt}", data, base))

    def u32s(box: Box) -> list[int]:
        return _entry_table(box, 4, "I")

    stsz = stbl.find(b"stsz")
    stsc = stbl.find(b"stsc")
    stco = stbl.find(b"stco")
    co64 = stbl.find(b"co64")
    stts = stbl.find(b"stts")
    if stsz is None or stsc is None or (stco is None and co64 is None):
        raise ValueError("sample table incomplete (need stsz+stsc+stco)")
    # stsz: fixed size or per-sample table.  Counts come from the FILE
    # and are hostile until proven otherwise: the variable path is
    # self-bounding (unpack_from raises past the payload), the fixed
    # path must be bounded explicitly or a declared n_samples near 2^32
    # allocates gigabytes before any quarantine can fire (round-6
    # review finding)
    p = _full_box(data, stsz)
    fixed_size, n_samples = struct.unpack_from(">II", data, p)
    if fixed_size:
        if fixed_size * n_samples > len(data):
            raise ValueError(
                f"stsz declares {n_samples} samples x {fixed_size} B "
                f"> file size {len(data)} — corrupt table"
            )
        sizes = [fixed_size] * n_samples
    else:
        if p + 8 + 4 * n_samples > stsz.offset + stsz.size:
            raise ValueError(
                f"stsz declares {n_samples} entries beyond its box payload"
            )
        sizes = list(struct.unpack_from(f">{n_samples}I", data, p + 8))
    # chunk offsets
    if stco is not None:
        offsets = u32s(stco)
    else:
        offsets = _entry_table(co64, 8, "Q")
    # stsc runs → samples-per-chunk for every chunk
    (n_stsc,) = struct.unpack_from(">I", data, _full_box(data, stsc))
    if 4 + 12 * n_stsc > stsc.size - 12:  # entries must fit the box
        raise ValueError(f"stsc declares {n_stsc} entries beyond its box")
    entries = [
        struct.unpack_from(">III", data, _full_box(data, stsc) + 4 + 12 * k)
        for k in range(n_stsc)
    ]
    # each run's span is clamped to the REAL chunk universe (len(offsets)):
    # a hostile 2-entry stsc with a large first_chunk gap otherwise
    # allocates [per]*gap — hundreds of MB from a 555-byte file — before
    # any later check fires (round-6 advisory finding)
    spc: list[int] = []
    prev_first = 0
    for k, (first, per, _desc) in enumerate(entries):
        if first <= prev_first:
            raise ValueError(
                f"stsc first_chunk not strictly increasing at entry {k}"
            )
        prev_first = first
        last = entries[k + 1][0] - 1 if k + 1 < len(entries) else len(offsets)
        last = min(last, len(offsets))
        if last >= first:
            spc.extend([per] * (last - first + 1))
    # sync samples
    sync: set[int] = set()
    stss = stbl.find(b"stss")
    if stss is None:
        sync = set(range(1, n_samples + 1))  # absent stss ⇒ all sync
    else:
        sync = set(u32s(stss))
    # decode timestamps from stts runs — run counts are file-declared,
    # so clamp accumulation at n_samples (a single 16-byte stts box can
    # otherwise declare a 2^32-entry run and loop for minutes)
    dts: list[int] = []
    if stts is not None:
        (n_stts,) = struct.unpack_from(">I", data, _full_box(data, stts))
        t = 0
        for k in range(n_stts):
            if len(dts) >= n_samples:
                break
            cnt, delta = struct.unpack_from(
                ">II", data, _full_box(data, stts) + 4 + 8 * k
            )
            for _ in range(min(cnt, n_samples - len(dts))):
                dts.append(t)
                t += delta
    dts += [0] * (n_samples - len(dts))
    # walk chunks, laying samples end to end
    out: list[SampleRecord] = []
    s = 0
    for ci, coff in enumerate(offsets):
        within = 0
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if s >= n_samples:
                break
            out.append(
                SampleRecord(
                    sample=s + 1,
                    offset=coff + within,
                    size=sizes[s],
                    dts=dts[s],
                    is_sync=(s + 1) in sync,
                )
            )
            within += sizes[s]
            s += 1
    if s != n_samples:
        raise ValueError(
            f"sample tables inconsistent: laid out {s} of {n_samples}"
        )
    return out


# ------------------------------------------------------------ test twin


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    return _box(btype, struct.pack(">I", version << 24) + payload)


def build_minimal_mp4(
    *,
    codec: bytes = b"avc1",
    width: int = 64,
    height: int = 48,
    timescale: int = 600,
    sample_sizes: list[int] | None = None,
    samples_per_chunk: list[tuple[int, int]] | None = None,
    chunk_offsets: list[int] | None = None,
    sync_samples: list[int] | None = None,
    stts_runs: list[tuple[int, int]] | None = None,
    sps: list[bytes] | None = None,
    pps: list[bytes] | None = None,
    mdat: bytes = b"",
) -> bytes:
    """Serializer twin: a minimal but structurally honest MP4 with one
    video track.  All tables are caller-controlled so tests construct
    exact stsc/stco/stss edge cases."""
    sample_sizes = sample_sizes or [10, 20, 30]
    samples_per_chunk = samples_per_chunk or [(1, len(sample_sizes))]
    chunk_offsets = chunk_offsets or [0]
    stts_runs = stts_runs or [(len(sample_sizes), 100)]
    sps = sps or []
    pps = pps or []

    avcc = b""
    if sps or pps:
        body = bytes([1, 66, 0, 30, 0xFF, 0xE0 | len(sps)])
        for s in sps:
            body += struct.pack(">H", len(s)) + s
        body += bytes([len(pps)])
        for p in pps:
            body += struct.pack(">H", len(p)) + p
        avcc = _box(b"avcC", body)
    entry = (
        bytes(6) + struct.pack(">H", 1) + bytes(16)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + bytes(4) + struct.pack(">H", 1) + bytes(32)
        + struct.pack(">Hh", 0x18, -1)
        + avcc
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + _box(codec, entry))
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, len(sample_sizes))
        + b"".join(struct.pack(">I", s) for s in sample_sizes),
    )
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(samples_per_chunk))
        + b"".join(
            struct.pack(">III", first, per, 1)
            for first, per in samples_per_chunk
        ),
    )
    stco = _full(
        b"stco",
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stts = _full(
        b"stts",
        struct.pack(">I", len(stts_runs))
        + b"".join(struct.pack(">II", c, d) for c, d in stts_runs),
    )
    stbl_payload = stsd + stts + stsc + stsz + stco
    if sync_samples is not None:
        stbl_payload += _full(
            b"stss",
            struct.pack(">I", len(sync_samples))
            + b"".join(struct.pack(">I", s) for s in sync_samples),
        )
    stbl = _box(b"stbl", stbl_payload)
    minf = _box(b"minf", stbl)
    hdlr = _full(b"hdlr", bytes(4) + b"vide" + bytes(12) + b"\x00")
    mdhd = _full(
        b"mdhd", struct.pack(">IIII", 0, 0, timescale, 0) + struct.pack(">HH", 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", bytes(80))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", bytes(96))
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    out = ftyp + moov
    if mdat:
        out += _box(b"mdat", mdat)
    return out
