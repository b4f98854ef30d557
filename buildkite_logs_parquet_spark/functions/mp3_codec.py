"""MPEG audio (MP3) Layer-III STRUCTURE codec — from the public
ISO/IEC 11172-3 / 13818-3 bitstream layout.

Scope (and the honest boundary): everything in an MP3 stream that is
*algorithmically specified* is implemented here in full —

* frame header fields and frame-length arithmetic,
* the complete Layer-III side-information parse for MPEG-1 and the
  MPEG-2/2.5 LSF variant (granule/channel block types, table selects,
  region counts, subblock gains, scfsi, …),
* the CRC-16 protection check (poly x^16+x^15+x^2+1, init 0xFFFF, over
  the last two header bytes + the side information),
* bit-reservoir resolution: each frame's ``main_data_begin`` back
  pointer is resolved against the rolling reservoir to the frame's
  LOGICAL main-data span (file offsets + bit length), including the
  "unresolvable" verdict for streams cut mid-reservoir,
* safe SPLIT POINTS: frames with ``main_data_begin == 0`` need no
  history, so a 100 TB audio corpus can be chunked for parallel decode
  exactly there — the structural fact a distributed pipeline needs.

What is deliberately NOT here: spectral reconstruction to PCM.  The
remaining steps (Huffman decode → requantize → stereo → alias → IMDCT →
polyphase synthesis) depend on ISO's *tabulated data* — 34 empirical
Huffman code tables and the 512-coefficient synthesis window — which
are printed in the standard, not derivable from a formula.  This
container has neither the tables nor network access, and reproducing
hundreds of constants from memory risks a decoder that runs and is
silently WRONG — worse than no decoder.  PCM decode therefore stays
behind the explicit ``multimodal.strict_decode`` seam (the pattern the
project brief prescribes for codec-library gaps); at deployment, wire a
real codec in there and every operator above it (fingerprint, features,
near-dup) works unchanged — they already run on decoded arrays.

A :class:`BitWriter`/side-info serializer is included so tests can
round-trip randomized side-info field vectors (hypothesis) instead of
trusting hand-decoded fixtures.

Reference parity note: the reference repo has no audio path at all —
this module extends the engine's multimodal tier (project brief), it
does not mirror a reference file.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# ---------------------------------------------------------------- bit I/O


class BitReader:
    """MSB-first bit reader over ``bytes``."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bit_pos: int = 0) -> None:
        self.data = data
        self.pos = bit_pos

    def read(self, n: int) -> int:
        # one int.from_bytes over the covering byte span instead of a
        # per-bit loop: ~20x on the side-info hot path (measured — the
        # structure walk is CPU-bound pure Python inside mapInPandas)
        pos = self.pos
        end = pos + n
        if end > len(self.data) * 8:
            # a silent zero-fill here let truncated SPS/side-info parse
            # to WRONG values with no error (caught by the round-6
            # review: a cut-off SPS "parsed" to fabricated geometry) —
            # over-read must raise so quarantine seams actually fire
            raise ValueError(
                f"bitstream over-read: need bit {end}, have {len(self.data) * 8}"
            )
        byte_start = pos >> 3
        byte_end = (end + 7) >> 3
        chunk = int.from_bytes(self.data[byte_start:byte_end], "big")
        shift = byte_end * 8 - end
        self.pos = end
        return (chunk >> shift) & ((1 << n) - 1)


class BitWriter:
    """MSB-first bit writer (test fixtures + side-info serialization)."""

    def __init__(self) -> None:
        self._bits: list[int] = []

    def write(self, value: int, n: int) -> "BitWriter":
        if value < 0 or value >= (1 << n):
            raise ValueError(f"{value} does not fit in {n} bits")
        for i in range(n - 1, -1, -1):
            self._bits.append((value >> i) & 1)
        return self

    def to_bytes(self) -> bytes:
        bits = self._bits + [0] * (-len(self._bits) % 8)
        return bytes(
            sum(b << (7 - i) for i, b in enumerate(bits[k : k + 8]))
            for k in range(0, len(bits), 8)
        )

    def __len__(self) -> int:  # bits written so far
        return len(self._bits)


# ------------------------------------------------------------- header layer

#: bitrate kbps by [version-group][layer][index]; index 0 = free, 15 = bad
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_SAMPLE_RATES = {  # by version bits
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],  # MPEG-2.5
}
_VERSION_NAME = {3: "1", 2: "2", 0: "2.5"}


@dataclass
class FrameHeader:
    version: str  # "1" | "2" | "2.5"
    layer: int  # 1..3
    protected: bool  # CRC present
    bitrate_kbps: int
    sample_rate: int
    padding: bool
    channel_mode: int  # 0 stereo, 1 joint, 2 dual, 3 mono
    mode_extension: int
    frame_bytes: int  # total, header included
    samples: int  # PCM samples this frame decodes to
    lsf: bool  # low-sampling-frequency (MPEG-2/2.5) variant

    @property
    def n_channels(self) -> int:
        return 1 if self.channel_mode == 3 else 2

    @property
    def n_granules(self) -> int:
        return 1 if self.lsf else 2

    @property
    def side_info_bytes(self) -> int:
        if self.lsf:
            return 9 if self.n_channels == 1 else 17
        return 17 if self.n_channels == 1 else 32


def parse_frame_header(b: bytes) -> FrameHeader:
    """Parse a 4-byte Layer-III frame header; raises ValueError on
    anything that is not a valid, fixed-bitrate Layer-III header."""
    if len(b) < 4:
        raise ValueError("short header")
    b0, b1, b2, b3 = b[0], b[1], b[2], b[3]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError("no sync")
    ver_bits = (b1 >> 3) & 0x3
    if ver_bits == 1:
        raise ValueError("reserved version")
    layer = 4 - ((b1 >> 1) & 0x3)
    if layer == 4:
        raise ValueError("reserved layer")
    if layer != 3:
        raise ValueError(f"layer {layer}: this module is Layer III only")
    protected = (b1 & 1) == 0
    br_idx = (b2 >> 4) & 0xF
    if br_idx in (0, 15):
        raise ValueError("free-format/invalid bitrate")
    sr_idx = (b2 >> 2) & 0x3
    if sr_idx == 3:
        raise ValueError("reserved sample rate")
    lsf = ver_bits != 3
    bitrate = (_BITRATES_V2_L3 if lsf else _BITRATES_V1_L3)[br_idx]
    sr = _SAMPLE_RATES[ver_bits][sr_idx]
    padding = bool((b2 >> 1) & 1)
    mode = (b3 >> 6) & 0x3
    mode_ext = (b3 >> 4) & 0x3
    # Layer III frame size: floor(coef * bitrate / sr) + padding,
    # coef = 144 (MPEG-1) / 72 (LSF) bytes·Hz per kbps·1000
    coef = 72 if lsf else 144
    frame_bytes = (coef * bitrate * 1000) // sr + (1 if padding else 0)
    return FrameHeader(
        version=_VERSION_NAME[ver_bits],
        layer=layer,
        protected=protected,
        bitrate_kbps=bitrate,
        sample_rate=sr,
        padding=padding,
        channel_mode=mode,
        mode_extension=mode_ext,
        frame_bytes=frame_bytes,
        samples=576 if lsf else 1152,
        lsf=lsf,
    )


def build_frame_header(
    *,
    lsf: bool = False,
    version25: bool = False,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    padding: bool = False,
    channel_mode: int = 3,
    protected: bool = False,
) -> bytes:
    """Serialize a Layer-III header (test-fixture twin of
    ``parse_frame_header``)."""
    table = _BITRATES_V2_L3 if lsf else _BITRATES_V1_L3
    br_idx = table.index(bitrate_kbps)
    ver_bits = (0 if version25 else 2) if lsf else 3
    sr_idx = _SAMPLE_RATES[ver_bits].index(sample_rate)
    b1 = 0xE0 | (ver_bits << 3) | (1 << 1) | (0 if protected else 1)
    b2 = (br_idx << 4) | (sr_idx << 2) | ((1 if padding else 0) << 1)
    b3 = channel_mode << 6
    return bytes([0xFF, b1, b2, b3])


# --------------------------------------------------------------- side info

#: per-(granule, channel) fields, in bitstream order
_GRANULE_FIELDS = (
    "part2_3_length",
    "big_values",
    "global_gain",
    "scalefac_compress",
    "window_switching",
    "block_type",
    "mixed_block",
    "table_select",
    "subblock_gain",
    "region0_count",
    "region1_count",
    "preflag",
    "scalefac_scale",
    "count1table_select",
)


@dataclass
class GranuleInfo:
    part2_3_length: int = 0
    big_values: int = 0
    global_gain: int = 0
    scalefac_compress: int = 0
    window_switching: bool = False
    block_type: int = 0
    mixed_block: bool = False
    table_select: tuple[int, ...] = (0, 0, 0)
    subblock_gain: tuple[int, int, int] = (0, 0, 0)
    region0_count: int = 0
    region1_count: int = 0
    preflag: bool = False
    scalefac_scale: bool = False
    count1table_select: int = 0


@dataclass
class SideInfo:
    main_data_begin: int = 0
    private_bits: int = 0
    scfsi: tuple[tuple[int, int, int, int], ...] = ((0, 0, 0, 0),)
    granules: list[list[GranuleInfo]] = field(default_factory=list)
    # granules[gr][ch]


def parse_side_info(data: bytes, hdr: FrameHeader) -> SideInfo:
    """Full Layer-III side-information parse (ISO 11172-3 §2.4.1.7 /
    13818-3 LSF layout), starting at ``data[0]``."""
    r = BitReader(data)
    nch = hdr.n_channels
    si = SideInfo()
    if hdr.lsf:
        si.main_data_begin = r.read(8)
        si.private_bits = r.read(1 if nch == 1 else 2)
        si.scfsi = tuple((0, 0, 0, 0) for _ in range(nch))
    else:
        si.main_data_begin = r.read(9)
        si.private_bits = r.read(5 if nch == 1 else 3)
        si.scfsi = tuple(
            tuple(r.read(1) for _ in range(4)) for _ in range(nch)
        )
    for _gr in range(hdr.n_granules):
        row: list[GranuleInfo] = []
        for _ch in range(nch):
            g = GranuleInfo()
            g.part2_3_length = r.read(12)
            g.big_values = r.read(9)
            g.global_gain = r.read(8)
            g.scalefac_compress = r.read(9 if hdr.lsf else 4)
            g.window_switching = bool(r.read(1))
            if g.window_switching:
                g.block_type = r.read(2)
                g.mixed_block = bool(r.read(1))
                g.table_select = (r.read(5), r.read(5))
                g.subblock_gain = (r.read(3), r.read(3), r.read(3))
                # region counts are implied for switched windows
                g.region0_count = 8 if g.block_type == 2 and not g.mixed_block else 7
                g.region1_count = 36  # "rest" per the standard's convention
            else:
                g.table_select = (r.read(5), r.read(5), r.read(5))
                g.region0_count = r.read(4)
                g.region1_count = r.read(3)
            if not hdr.lsf:
                g.preflag = bool(r.read(1))
            g.scalefac_scale = bool(r.read(1))
            g.count1table_select = r.read(1)
            row.append(g)
        si.granules.append(row)
    expect = hdr.side_info_bytes * 8
    if r.pos != expect:
        raise AssertionError(f"side info consumed {r.pos} bits, expected {expect}")
    return si


def write_side_info(si: SideInfo, hdr: FrameHeader) -> bytes:
    """Serialize a :class:`SideInfo` (round-trip twin of
    ``parse_side_info`` — property-tested)."""
    w = BitWriter()
    nch = hdr.n_channels
    if hdr.lsf:
        w.write(si.main_data_begin, 8)
        w.write(si.private_bits, 1 if nch == 1 else 2)
    else:
        w.write(si.main_data_begin, 9)
        w.write(si.private_bits, 5 if nch == 1 else 3)
        for ch in range(nch):
            for bit in si.scfsi[ch]:
                w.write(bit, 1)
    for gr in range(hdr.n_granules):
        for ch in range(nch):
            g = si.granules[gr][ch]
            w.write(g.part2_3_length, 12)
            w.write(g.big_values, 9)
            w.write(g.global_gain, 8)
            w.write(g.scalefac_compress, 9 if hdr.lsf else 4)
            w.write(1 if g.window_switching else 0, 1)
            if g.window_switching:
                w.write(g.block_type, 2)
                w.write(1 if g.mixed_block else 0, 1)
                w.write(g.table_select[0], 5)
                w.write(g.table_select[1], 5)
                for s in g.subblock_gain:
                    w.write(s, 3)
            else:
                for t in g.table_select:
                    w.write(t, 5)
                w.write(g.region0_count, 4)
                w.write(g.region1_count, 3)
            if not hdr.lsf:
                w.write(1 if g.preflag else 0, 1)
            w.write(1 if g.scalefac_scale else 0, 1)
            w.write(g.count1table_select, 1)
    out = w.to_bytes()
    assert len(out) == hdr.side_info_bytes
    return out


# ------------------------------------------------------------------- CRC-16


def crc16_mp3(chunks: bytes) -> int:
    """ISO 11172-3 protection CRC: poly x^16+x^15+x^2+1 (0x8005), init
    0xFFFF, MSB-first, no final xor — computed over the last two header
    bytes + the side information."""
    crc = 0xFFFF
    for byte in chunks:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            hi = (crc >> 15) & 1
            crc = (crc << 1) & 0xFFFF
            if hi ^ bit:
                crc ^= 0x8005
    return crc


# -------------------------------------------------------- stream structure


@dataclass
class FrameRecord:
    index: int
    offset: int  # file offset of the sync word
    frame_bytes: int
    header: FrameHeader
    side_info: SideInfo
    crc_stored: int | None
    crc_ok: bool | None
    main_data_offset: int  # file offset where this frame's data REGION starts
    main_data_region_bytes: int
    part2_3_bits: int  # Σ part2_3_length over granules × channels
    # bit-reservoir resolution (logical stream of main-data bytes):
    logical_start_byte: int | None  # offset into the concatenated main-data stream
    resolved: bool  # enough reservoir history to decode this frame
    is_split_point: bool  # main_data_begin == 0: decodable with no history


# ID3v2 sizing is shared with audio_codec (syncsafe masks + footer flag
# handled there) — two parallel implementations of the same bitstream
# math would drift, and did: an earlier local copy dropped the 0x7F
# masks and the +10 footer
from buildkite_logs_parquet_spark.functions.audio_codec import _id3v2_size


def walk_frames(data: bytes, max_frames: int | None = None) -> list[FrameRecord]:
    """Walk a Layer-III stream into fully parsed :class:`FrameRecord`s,
    resolving each frame's bit-reservoir back pointer against the
    rolling main-data stream.  Resyncs on junk; stops at ID3v1.

    The reservoir model (ISO 11172-3 §2.4.2.7 bit_reservoir): the
    main-data sections of consecutive frames form ONE logical byte
    stream; frame *i*'s data begins ``main_data_begin`` bytes BEFORE
    the start of its own section in that stream.  ``resolved`` is False
    when the pointer reaches past the observed history (stream cut
    mid-reservoir) — exactly the frames a distributed chunker must not
    start decoding at; ``is_split_point`` marks the safe starts."""
    pos = _id3v2_size(data)
    end = len(data)
    if end >= 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128
    out: list[FrameRecord] = []
    reservoir_bytes = 0  # main-data bytes in the CONTIGUOUS run so far
    expected_pos: int | None = None  # where the next frame must start
    while pos + 4 <= end:
        try:
            hdr = parse_frame_header(data[pos : pos + 4])
        except ValueError:
            pos += 1
            continue
        if pos + hdr.frame_bytes > end:
            break
        si_off = pos + 4 + (2 if hdr.protected else 0)
        si_len = hdr.side_info_bytes
        if si_off + si_len > end:
            break
        if expected_pos is not None and pos != expected_pos:
            # resync GAP: bytes (possibly a whole corrupt frame) dropped
            # out of the logical main-data stream — every back pointer
            # across the gap is untrustworthy, so the reservoir resets;
            # frames with main_data_begin > 0 right after a gap resolve
            # to a negative logical offset and report resolved=False,
            # and the next main_data_begin == 0 frame restarts cleanly
            reservoir_bytes = 0
        si = parse_side_info(data[si_off : si_off + si_len], hdr)
        crc_stored = crc_ok = None
        if hdr.protected:
            crc_stored = int.from_bytes(data[pos + 4 : pos + 6], "big")
            crc_ok = (
                crc16_mp3(data[pos + 2 : pos + 4] + data[si_off : si_off + si_len])
                == crc_stored
            )
        md_off = si_off + si_len
        md_len = pos + hdr.frame_bytes - md_off
        part2_3 = sum(
            g.part2_3_length for row in si.granules for g in row
        )
        logical = reservoir_bytes - si.main_data_begin
        resolved = logical >= 0
        out.append(
            FrameRecord(
                index=len(out),
                offset=pos,
                frame_bytes=hdr.frame_bytes,
                header=hdr,
                side_info=si,
                crc_stored=crc_stored,
                crc_ok=crc_ok,
                main_data_offset=md_off,
                main_data_region_bytes=max(md_len, 0),
                part2_3_bits=part2_3,
                logical_start_byte=logical if resolved else None,
                resolved=resolved,
                is_split_point=si.main_data_begin == 0,
            )
        )
        reservoir_bytes += max(md_len, 0)
        pos += hdr.frame_bytes
        expected_pos = pos
        if max_frames is not None and len(out) >= max_frames:
            break
    if not out:
        raise ValueError("no valid Layer-III frame found")
    return out


def parse_xing(data: bytes, frame: FrameRecord) -> dict | None:
    """Xing/Info VBR header, if the first frame carries one: it sits at
    the start of the frame's main-data region (which is why that frame
    decodes as silence).  Returns {tag, n_frames, n_bytes, has_toc,
    quality} for the fields whose flags are set."""
    start = frame.main_data_offset
    tag = data[start : start + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    pos = start + 4
    flags = int.from_bytes(data[pos : pos + 4], "big")
    pos += 4
    out: dict = {"tag": tag.decode(), "n_frames": None, "n_bytes": None,
                 "has_toc": bool(flags & 4), "quality": None}
    if flags & 1:
        out["n_frames"] = int.from_bytes(data[pos : pos + 4], "big")
        pos += 4
    if flags & 2:
        out["n_bytes"] = int.from_bytes(data[pos : pos + 4], "big")
        pos += 4
    if flags & 4:
        pos += 100  # seek TOC
    if flags & 8:
        out["quality"] = int.from_bytes(data[pos : pos + 4], "big")
    return out
