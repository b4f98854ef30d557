"""HTML → text extraction (stdlib ``html.parser``) — the step between a
raw crawl (WARC ``response`` records: HTTP envelope + HTML body) and the
``documents`` table every downstream operator consumes.

WET files ship pre-extracted text, but a pipeline that can only read WET
is chained to someone else's extraction; this module implements the
extraction itself from public pieces alone:

* ``parse_http_response``: HTTP/1.x envelope split (status line,
  headers, body), chunked transfer-encoding de-chunking, charset from
  the Content-Type header with UTF-8/replace fallback,
* ``extract_html_text``: tag-aware text walk — script/style/noscript/
  template subtrees dropped, block elements break paragraphs, entities
  decoded by the parser, whitespace collapsed per paragraph; also
  returns the title and the outbound-link count (the fan-out signal the
  URL/graph operators key on).

This is boilerplate-light extraction in the jusText/trafilatura SHAPE
(tag-structural, no rendering); ML boilerplate classifiers can replace
the same seam.  Per-document cost is linear in the HTML; at 100 TB it
rides the Arrow-batched ``mapInPandas`` stage in ``sources/warc.py``,
scaling with executors.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

#: subtrees whose text is never content
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}

#: tags that end/start a paragraph break in the extracted text
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "footer", "section",
    "article", "aside", "nav", "blockquote", "pre", "figure",
    "figcaption", "main", "form", "hr", "dl", "dt", "dd",
}

_WS = re.compile(r"\s+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # text runs as (text, in_link); "\n" sentinel marks block breaks
        self.parts: list[tuple[str, bool] | str] = []
        self.title_parts: list[str] = []
        self.n_links = 0
        self._skip_depth = 0
        self._link_depth = 0
        self._in_title = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True
        if tag == "a":
            self._link_depth += 1
            if any(k == "href" for k, _ in attrs):
                self.n_links += 1
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title":
            self._in_title = False
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    # void elements (<br/>, <hr/>) arrive here in XHTML-style markup
    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag == "a":  # self-closed anchor opens nothing
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        if data:
            self.parts.append((data, self._link_depth > 0))


def extract_html_blocks(html: str) -> dict:
    """Block-level extraction: ``{"title", "n_links", "blocks"}`` where
    each block is ``{"text", "n_words", "link_density"}`` —
    ``link_density`` is the fraction of the block's characters that sit
    inside ``<a>`` subtrees, the jusText/boilerpipe signal that
    separates navigation chrome from prose.  Malformed markup never
    raises (``html.parser`` is tolerant by design)."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    blocks: list[dict] = []
    cur: list[str] = []
    link_chars = 0

    def flush() -> None:
        nonlocal cur, link_chars
        joined = _WS.sub(" ", " ".join(cur)).strip()
        if joined:
            total = sum(len(_WS.sub(" ", t).strip()) for t in cur) or 1
            blocks.append(
                {
                    "text": joined,
                    "n_words": len(joined.split()),
                    "link_density": min(1.0, link_chars / total),
                }
            )
        cur = []
        link_chars = 0

    for part in p.parts:
        if part == "\n":
            flush()
        else:
            text, in_link = part
            cur.append(text)
            if in_link:
                link_chars += len(_WS.sub(" ", text).strip())
    flush()
    title = _WS.sub(" ", " ".join(p.title_parts)).strip() or None
    return {"title": title, "n_links": p.n_links, "blocks": blocks}


def main_content(
    blocks: list[dict],
    min_words: int = 4,
    max_link_density: float = 0.5,
) -> str:
    """Boilerplate-dropped text: keep blocks with enough words and a low
    link density (the classic jusText-style thresholds) — navigation
    bars, footers, and tag clouds are short and link-saturated, prose is
    neither."""
    return "\n".join(
        b["text"]
        for b in blocks
        if b["n_words"] >= min_words and b["link_density"] <= max_link_density
    )


def extract_html_text(html: str) -> dict:
    """``{"title", "text", "n_links"}`` from an HTML string.

    ``text`` is newline-separated paragraphs (block tags break
    paragraphs, whitespace collapsed within each); ``title`` is the
    collapsed <title> content or None.  ALL blocks are kept — use
    :func:`extract_html_blocks` + :func:`main_content` for the
    boilerplate-dropped variant.
    """
    doc = extract_html_blocks(html)
    return {
        "title": doc["title"],
        "text": "\n".join(b["text"] for b in doc["blocks"]),
        "n_links": doc["n_links"],
    }


_CHARSET = re.compile(rb"charset\s*=\s*\"?([A-Za-z0-9_.-]+)", re.I)


def parse_http_response(payload: bytes) -> dict:
    """Split a raw HTTP/1.x response (what a WARC ``response`` record
    stores) into status / headers / decoded body.

    Handles chunked transfer-encoding and the Content-Type charset;
    undecodable bytes are replaced, never raised.  Returns
    ``{"status", "content_type", "body"}``; a payload with no HTTP
    envelope (some crawlers store the bare body) is passed through
    with status None.
    """
    sep = payload.find(b"\r\n\r\n")
    nl = b"\r\n"
    if sep == -1:
        sep = payload.find(b"\n\n")
        nl = b"\n"
    if sep == -1 or not payload[:5].upper().startswith(b"HTTP/"):
        return {
            "status": None,
            "content_type": None,
            "body": payload.decode("utf-8", errors="replace"),
        }
    head = payload[:sep]
    body = payload[sep + 2 * len(nl) :]
    lines = head.split(nl)
    status = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    headers: dict[bytes, bytes] = {}
    for line in lines[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower()] = v.strip()
    if headers.get(b"transfer-encoding", b"").lower() == b"chunked":
        body = _dechunk(body)
    ctype = headers.get(b"content-type", b"")
    m = _CHARSET.search(ctype)
    charset = m.group(1).decode("ascii", errors="replace") if m else "utf-8"
    try:
        text = body.decode(charset, errors="replace")
    except LookupError:  # unknown charset label
        text = body.decode("utf-8", errors="replace")
    return {
        "status": status,
        "content_type": ctype.decode("ascii", errors="replace") or None,
        "body": text,
    }


def _dechunk(body: bytes) -> bytes:
    """Concatenate HTTP chunked-encoding chunks; stop at the 0 chunk or
    on framing damage (returning what was assembled — tolerant)."""
    out = bytearray()
    pos = 0
    while pos < len(body):
        eol = body.find(b"\r\n", pos)
        if eol == -1:
            break
        size_str = body[pos:eol].split(b";")[0].strip()
        try:
            size = int(size_str, 16)
        except ValueError:
            break
        if size == 0:
            break
        out += body[eol + 2 : eol + 2 + size]
        pos = eol + 2 + size + 2  # skip chunk + trailing CRLF
    return bytes(out)
