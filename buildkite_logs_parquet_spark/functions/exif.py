"""EXIF metadata for JPEG payloads — parse and strip, pure stdlib.

From the public EXIF 2.x / TIFF 6.0 layouts: a JPEG's APP1 segment
carries ``Exif\\0\\0`` + a TIFF file (II/MM byte order, IFD0 entry
table, sub-IFD pointers).  A training-data pipeline needs exactly two
things from it:

* :func:`parse_exif` — the curation-relevant summary (camera make /
  model, orientation, timestamp, GPS presence AND coordinates): dedupe
  by device, bucket by capture time, and — the privacy audit — COUNT
  what would leak;
* :func:`strip_exif` — remove every Exif APP1 segment (pixels and
  JFIF untouched).  Dropping the whole segment is the standard
  privacy-safe transform: a GPS-only rewrite means repacking the TIFF
  with offset fixups, where one bug silently corrupts metadata that
  LOOKS intact — all-or-nothing cannot half-leak.

Hostile-input discipline (the mp4_box lessons): every offset/count is
validated against the actual buffer; out-of-bounds structures raise
ValueError (the quarantine seam) instead of reading foreign bytes; IFD
chain walks are bounded so a cyclic next-IFD pointer cannot loop.

Serializer twin :func:`build_exif_app1` constructs real APP1 segments
(both byte orders, GPS sub-IFD, rational coordinates) so tests
round-trip constructed vectors instead of trusting opaque fixtures.

Reference parity note: no counterpart in the reference repo; extends
the multimodal/PII tier.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_SOI = b"\xff\xd8"
_EXIF_HEADER = b"Exif\x00\x00"

#: tag ids (public EXIF/TIFF registry)
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


@dataclass
class ExifSummary:
    make: str | None = None
    model: str | None = None
    orientation: int | None = None
    datetime: str | None = None
    has_gps: bool = False
    gps_lat: float | None = None
    gps_lon: float | None = None


def _jpeg_segments(data: bytes):
    """Yield ``(marker, seg_start, seg_end)`` for every marker segment
    up to SOS; entropy data and EOI are not walked (metadata lives
    before the scan)."""
    if data[:2] != _SOI:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xDA:  # SOS — entropy follows
            return
        if 0xD0 <= marker <= 0xD9:  # standalone
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if ln < 2 or pos + 2 + ln > len(data):
            raise ValueError(f"segment at {pos} overruns the file")
        yield marker, pos, pos + 2 + ln
        pos += 2 + ln


def _ifd_entries(tiff: bytes, fmt: str, off: int):
    """Yield ``(tag, type, count, value_bytes)`` for one IFD; offsets
    validated against the TIFF buffer."""
    if off + 2 > len(tiff):
        raise ValueError("IFD offset beyond buffer")
    (n,) = struct.unpack_from(fmt + "H", tiff, off)
    if off + 2 + 12 * n + 4 > len(tiff):
        raise ValueError(f"IFD declares {n} entries beyond buffer")
    for k in range(n):
        base = off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(fmt + "HHI", tiff, base)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            val = tiff[base + 8 : base + 8 + max(size, 0)]
        else:
            (voff,) = struct.unpack_from(fmt + "I", tiff, base + 8)
            if voff + size > len(tiff):
                raise ValueError(f"tag 0x{tag:04x} value beyond buffer")
            val = tiff[voff : voff + size]
        yield tag, typ, cnt, val


def _ascii(val: bytes) -> str:
    return val.split(b"\x00", 1)[0].decode("latin-1").strip()


def _rationals(fmt: str, val: bytes, cnt: int) -> list[float]:
    out = []
    for k in range(cnt):
        num, den = struct.unpack_from(fmt + "II", val, 8 * k)
        out.append(num / den if den else 0.0)
    return out


def _dms_to_deg(dms: list[float], ref: str) -> float | None:
    if len(dms) < 3:
        return None
    deg = dms[0] + dms[1] / 60.0 + dms[2] / 3600.0
    return -deg if ref in ("S", "W") else deg


def parse_exif(data: bytes) -> ExifSummary:
    """Curation summary of a JPEG's EXIF (missing APP1 → empty summary,
    not an error — most web images carry none).  Corrupt TIFF
    structures raise ValueError."""
    out = ExifSummary()
    for marker, s, e in _jpeg_segments(data):
        if marker != 0xE1 or data[s + 4 : s + 10] != _EXIF_HEADER:
            continue
        tiff = data[s + 10 : e]
        if len(tiff) < 8:
            raise ValueError("APP1 too short for a TIFF header")
        order = tiff[:2]
        if order == b"II":
            fmt = "<"
        elif order == b"MM":
            fmt = ">"
        else:
            raise ValueError("bad TIFF byte order")
        (ifd0,) = struct.unpack_from(fmt + "I", tiff, 4)
        gps_off = None
        for tag, typ, cnt, val in _ifd_entries(tiff, fmt, ifd0):
            if tag == _TAG_MAKE and typ == 2:
                out.make = _ascii(val)
            elif tag == _TAG_MODEL and typ == 2:
                out.model = _ascii(val)
            elif tag == _TAG_ORIENTATION and typ == 3:
                (out.orientation,) = struct.unpack_from(fmt + "H", val, 0)
            elif tag == _TAG_DATETIME and typ == 2:
                out.datetime = _ascii(val)
            elif tag == _TAG_GPS_IFD and typ == 4:
                (gps_off,) = struct.unpack_from(fmt + "I", val, 0)
        if gps_off is not None:
            out.has_gps = True
            lat = lon = None
            lat_ref = lon_ref = ""
            for tag, typ, cnt, val in _ifd_entries(tiff, fmt, gps_off):
                if tag == _GPS_LAT_REF and typ == 2:
                    lat_ref = _ascii(val)
                elif tag == _GPS_LON_REF and typ == 2:
                    lon_ref = _ascii(val)
                elif tag == _GPS_LAT and typ == 5:
                    lat = _rationals(fmt, val, min(cnt, 3))
                elif tag == _GPS_LON and typ == 5:
                    lon = _rationals(fmt, val, min(cnt, 3))
            if lat is not None:
                out.gps_lat = _dms_to_deg(lat, lat_ref)
            if lon is not None:
                out.gps_lon = _dms_to_deg(lon, lon_ref)
        return out  # first Exif APP1 wins (spec: at most one)
    return out


def strip_exif(data: bytes) -> bytes:
    """Return the JPEG without any Exif APP1 segment — pixels, JFIF
    APP0, and every other segment byte-identical.  Idempotent; a JPEG
    with no EXIF returns unchanged bytes."""
    drops = [
        (s, e)
        for marker, s, e in _jpeg_segments(data)
        if marker == 0xE1 and data[s + 4 : s + 10] == _EXIF_HEADER
    ]
    if not drops:
        return data
    out = bytearray()
    pos = 0
    for s, e in drops:
        out += data[pos:s]
        pos = e
    out += data[pos:]
    return bytes(out)


def build_exif_app1(
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    gps: tuple[float, float] | None = None,
    byte_order: str = "II",
) -> bytes:
    """Serializer twin: a real APP1 Exif segment (marker + length
    included) for test fixtures — IFD0 with the summary tags and, with
    ``gps``, a GPS sub-IFD holding signed decimal coordinates as
    DMS rationals."""
    fmt = "<" if byte_order == "II" else ">"

    def _entry(tag, typ, cnt, val4_or_off):
        return struct.pack(fmt + "HHI", tag, typ, cnt) + val4_or_off

    # layout: header(8) | IFD0 | GPS IFD | data area
    entries0 = []
    data_area = bytearray()

    def _defer(payload: bytes) -> bytes:
        # placeholder patched once the data area's base offset is known
        data_area.extend(payload)
        return struct.pack(fmt + "I", len(data_area) - len(payload))

    def _ascii_tag(tag, text):
        payload = text.encode("latin-1") + b"\x00"
        if len(payload) <= 4:
            entries0.append(_entry(tag, 2, len(payload), payload.ljust(4, b"\x00")))
        else:
            entries0.append((tag, 2, len(payload), _defer(payload)))

    def _short_tag(tag, v):
        entries0.append(
            _entry(tag, 3, 1, struct.pack(fmt + "H", v) + b"\x00\x00")
        )

    if make:
        _ascii_tag(_TAG_MAKE, make)
    if model:
        _ascii_tag(_TAG_MODEL, model)
    if orientation is not None:
        _short_tag(_TAG_ORIENTATION, orientation)
    if datetime:
        _ascii_tag(_TAG_DATETIME, datetime)

    gps_entries = []
    if gps is not None:
        lat, lon = gps

        def _dms(v: float) -> bytes:
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            s = round(((v - d) * 60 - m) * 60 * 10000)
            return struct.pack(fmt + "IIIIII", d, 1, m, 1, s, 10000)

        gps_entries = [
            (_GPS_LAT_REF, 2, 2, (b"S\x00" if lat < 0 else b"N\x00").ljust(4, b"\x00")),
            (_GPS_LAT, 5, 3, _dms(lat)),
            (_GPS_LON_REF, 2, 2, (b"W\x00" if lon < 0 else b"E\x00").ljust(4, b"\x00")),
            (_GPS_LON, 5, 3, _dms(lon)),
        ]
        entries0.append((_TAG_GPS_IFD, 4, 1, None))  # patched below

    # resolve layout: IFD0 then GPS IFD then data area
    n0 = len(entries0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    gps_off = ifd0_off + ifd0_size
    n_gps = len(gps_entries)
    gps_size = (2 + 12 * n_gps + 4) if gps_entries else 0
    data_off = gps_off + gps_size

    def _resolve(entries, deferred_ok=True):
        blob = struct.pack(fmt + "H", len(entries))
        for ent in entries:
            if isinstance(ent, bytes):
                blob += ent
            else:
                tag, typ, cnt, val = ent
                if tag == _TAG_GPS_IFD:
                    blob += struct.pack(fmt + "HHII", tag, typ, cnt, gps_off)
                elif typ == 2:  # deferred ascii: val is the placeholder
                    (rel,) = struct.unpack(fmt + "I", val)
                    blob += struct.pack(
                        fmt + "HHII", tag, typ, cnt, data_off + rel
                    )
                else:
                    blob += struct.pack(fmt + "HHI", tag, typ, cnt) + val
        return blob + struct.pack(fmt + "I", 0)  # no next IFD

    tiff = bytearray()
    tiff += b"II" if fmt == "<" else b"MM"
    tiff += struct.pack(fmt + "H", 42)
    tiff += struct.pack(fmt + "I", ifd0_off)
    tiff += _resolve(entries0)
    if gps_entries:
        gblob = struct.pack(fmt + "H", n_gps)
        gdata = bytearray()
        for tag, typ, cnt, val in gps_entries:
            size = _TYPE_SIZES[typ] * cnt
            if size <= 4:
                gblob += struct.pack(fmt + "HHI", tag, typ, cnt) + val
            else:
                gblob += struct.pack(
                    fmt + "HHII", tag, typ, cnt, data_off + len(data_area) + len(gdata)
                )
                gdata.extend(val)
        gblob += struct.pack(fmt + "I", 0)
        tiff += gblob
        data_area.extend(gdata)
    tiff += data_area
    payload = _EXIF_HEADER + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
