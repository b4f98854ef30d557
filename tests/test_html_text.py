"""HTML → text extraction and HTTP envelope parsing."""

from buildkite_logs_parquet_spark.functions.html_text import (
    extract_html_text,
    parse_http_response,
)


def test_extract_drops_script_style_and_breaks_blocks():
    html = """<html><head>
      <title> My  Page </title>
      <style>body { color: red }</style>
      <script>var x = "not text";</script>
    </head><body>
      <h1>Heading</h1>
      <p>First <b>paragraph</b> with   spaces.</p>
      <div>Second<br/>third line</div>
      <noscript>hidden</noscript>
      <ul><li>item one</li><li>item two</li></ul>
      <a href="http://x.example/">link</a>
      <a name="anchor-no-href">not a link</a>
    </body></html>"""
    doc = extract_html_text(html)
    assert doc["title"] == "My Page"
    assert doc["n_links"] == 1
    lines = doc["text"].split("\n")
    assert lines[0] == "Heading"
    assert "First paragraph with spaces." in lines
    assert "Second" in lines and "third line" in lines
    assert "item one" in lines and "item two" in lines
    assert "color: red" not in doc["text"]
    assert "not text" not in doc["text"]
    assert "hidden" not in doc["text"]


def test_extract_entities_and_malformed_markup_tolerant():
    doc = extract_html_text("<p>a &amp; b &lt;c&gt;</p><p>unclosed <b>bold")
    assert doc["text"].split("\n") == ["a & b <c>", "unclosed bold"]
    # garbage never raises
    assert extract_html_text("<<<>>>&#x;<p")["n_links"] == 0


def test_parse_http_response_plain():
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"\r\n"
        b"<p>body</p>"
    )
    r = parse_http_response(payload)
    assert r["status"] == 200
    assert r["content_type"].startswith("text/html")
    assert r["body"] == "<p>body</p>"


def test_parse_http_response_chunked_and_charset():
    body = "café".encode("latin-1")
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=ISO-8859-1\r\n"
        b"Transfer-Encoding: chunked\r\n"
        b"\r\n"
        + f"{len(body):x}".encode() + b"\r\n" + body + b"\r\n"
        + b"0\r\n\r\n"
    )
    r = parse_http_response(payload)
    assert r["body"] == "café"


def test_parse_http_response_bare_body_passthrough():
    r = parse_http_response(b"<p>no envelope</p>")
    assert r["status"] is None
    assert r["body"] == "<p>no envelope</p>"


def test_parse_http_response_unknown_charset_falls_back():
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=not-a-charset\r\n"
        b"\r\n"
        b"ok"
    )
    assert parse_http_response(payload)["body"] == "ok"
