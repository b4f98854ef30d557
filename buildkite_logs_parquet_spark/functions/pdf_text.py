"""Minimal pure-stdlib PDF text extraction — the academic/document
corpus intake format (paper dumps, reports, filings are
overwhelmingly PDF).

Same policy as the other native codecs beside this module (PNG/JPEG/
FLAC/WARC): real bytes-in → text-out on the executor with zero
external dependencies, malformed input raises ``ValueError`` for the
caller's quarantine seam, and the honestly-unsupported remainder is
explicit rather than silently wrong.

Covered:

* object scan (``N G obj … endobj``) — xref-free, so mild structural
  damage (truncated xref, appended increments) does not kill the
  parse;
* stream decoding: ``/FlateDecode`` (zlib — the default text filter)
  and raw streams; ``/Length`` trusted but clamped to ``endstream``;
* content-stream text operators: ``Tj``, ``'``, ``"``, ``TJ`` (with
  kern-splits rendered as nothing and large negative kerns as a
  space), line-positioning ``Td/TD/T*`` as newlines, ``BT/ET``
  blocks;
* string syntax: literal strings with ``\\``-escapes (incl. octal,
  line continuations, balanced nested parens) and hex strings.

NOT covered (documented seam, raises nothing — these degrade, they
don't fail): CID/Type0 composite fonts with CMaps decode as best-
effort Latin-1 bytes (mojibake for non-Latin scripts — run
``operators/normalize.fix_mojibake_col`` downstream or treat as
binary); LZW/DCT/CCITT-filtered content streams are skipped;
encrypted PDFs raise ``NotImplementedError``.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_TEXT_OP_RE = re.compile(
    rb"""
      \((?P<lit>(?:\\.|[^\\()])*(?:\((?:\\.|[^\\()])*\)(?:\\.|[^\\()])*)*)\)\s*(?P<lop>Tj|'|")
    | <(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<hop>Tj|'|")
    | \[(?P<arr>(?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\[\]])*)\]\s*TJ
    | (?P<nl>T\*|TD|Td)
    """,
    re.X | re.S,
)
_ARR_ITEM_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>|(?P<num>-?\d+(?:\.\d+)?)"
)
_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESC:
            out += _ESC[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        else:
            i += 2  # unknown escape: drop the backslash
    return bytes(out)


def _decode_hex(raw: bytes) -> bytes:
    h = re.sub(rb"\s+", b"", raw)
    if len(h) % 2:
        h += b"0"  # PDF rule: odd final digit implies trailing 0
    return bytes.fromhex(h.decode("ascii"))


def _stream_text(content: bytes) -> str:
    """Text operators of ONE decoded content stream → plain text."""
    parts: list[str] = []
    for m in _TEXT_OP_RE.finditer(content):
        if m.group("nl") is not None:
            if parts and parts[-1] != "\n":
                parts.append("\n")
        elif m.group("lit") is not None:
            parts.append(_unescape_literal(m.group("lit")).decode("latin-1"))
            if m.group("lop") in (b"'", b'"'):
                parts.append("\n")
        elif m.group("hex") is not None:
            parts.append(_decode_hex(m.group("hex")).decode("latin-1"))
            if m.group("hop") in (b"'", b'"'):
                parts.append("\n")
        elif m.group("arr") is not None:
            for im in _ARR_ITEM_RE.finditer(m.group("arr")):
                if im.group("lit") is not None:
                    parts.append(
                        _unescape_literal(im.group("lit")).decode("latin-1")
                    )
                elif im.group("hex") is not None:
                    parts.append(_decode_hex(im.group("hex")).decode("latin-1"))
                elif float(im.group("num")) < -150:
                    parts.append(" ")  # large kern gap reads as a space
    return "".join(parts)


def extract_pdf_text(data: bytes) -> tuple[str, int]:
    """Extract ``(text, n_pages)`` from a PDF payload.  Pages join with
    form feeds; within a page, text-block line moves become newlines.
    Raises ``ValueError`` for non-PDF bytes and
    ``NotImplementedError`` for encrypted files."""
    raw = bytes(data)
    if not raw.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    if re.search(rb"/Encrypt\b", raw) and re.search(rb"trailer|/ID", raw):
        raise NotImplementedError("encrypted PDF")
    n_pages = len(re.findall(rb"/Type\s*/Page\b", raw))
    chunks: list[str] = []
    for m in _OBJ_RE.finditer(raw):
        body = m.group(3)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        payload = sm.group(1)
        head = body[: sm.start()]
        if re.search(rb"/Filter\s*/FlateDecode\b", head):
            try:
                payload = zlib.decompress(payload)
            except zlib.error as e:
                raise ValueError(f"PDF: bad Flate stream: {e}") from e
        elif re.search(rb"/Filter\b", head):
            continue  # unsupported filter (DCT/LZW/…): skip, don't fail
        if b"BT" not in payload:
            continue
        text = _stream_text(payload)
        if text.strip():
            chunks.append(text)
    return "\f".join(chunks), n_pages


def make_simple_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Fixture-side minimal PDF writer: one Flate (or raw) content
    stream per page, valid xref + trailer — enough structure that any
    conformant reader opens it, and an independent bit stream for the
    extractor's tests."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ).encode("latin-1")

    objs: list[bytes] = []
    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    for i, page in enumerate(pages):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {4 + 2 * i} 0 R /Resources << /Font "
                f"<< /F1 {3 + 2 * n} 0 R >> >> >>"
            ).encode()
        )
        lines = page.split("\n")
        ops = bytearray(b"BT /F1 12 Tf 72 720 Td ")
        for j, ln in enumerate(lines):
            if j:
                ops += b"0 -14 Td "
            ops += b"(" + esc(ln) + b") Tj "
        ops += b"ET"
        body = bytes(ops)
        if compress:
            z = zlib.compress(body)
            objs.append(
                f"<< /Length {len(z)} /Filter /FlateDecode >>".encode()
                + b"\nstream\n" + z + b"\nendstream"
            )
        else:
            objs.append(
                f"<< /Length {len(body)} >>".encode()
                + b"\nstream\n" + body + b"\nendstream"
            )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, ob in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + ob + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
