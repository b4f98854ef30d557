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


def test_blocks_link_density_and_main_content():
    from buildkite_logs_parquet_spark.functions.html_text import (
        extract_html_blocks,
        main_content,
    )

    html = (
        "<body>"
        "<nav><a href='/a'>Home</a> <a href='/b'>About</a> "
        "<a href='/c'>Contact</a></nav>"
        "<p>This is a real paragraph of prose with plenty of words and "
        "just one <a href='/ref'>reference</a> inside it.</p>"
        "<div><a href='/t1'>tag</a> <a href='/t2'>cloud</a></div>"
        "<footer>© example</footer>"
        "</body>"
    )
    doc = extract_html_blocks(html)
    by_text = {b["text"]: b for b in doc["blocks"]}
    nav = by_text["Home About Contact"]
    assert nav["link_density"] > 0.9
    prose = next(b for b in doc["blocks"] if "real paragraph" in b["text"])
    assert prose["link_density"] < 0.2
    assert prose["n_words"] > 10

    main = main_content(doc["blocks"])
    assert "real paragraph" in main
    assert "Home About" not in main  # link-saturated nav dropped
    assert "tag cloud" not in main
    assert "© example" not in main  # too short


def test_main_text_flows_through_warc_reader(spark, tmp_path):
    from buildkite_logs_parquet_spark.sources.warc import read_warc_html

    html = (
        "<title>T</title><nav><a href='/a'>x</a> <a href='/b'>y</a></nav>"
        "<p>genuine article content with a good number of words here</p>"
    )
    body = html.encode()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    rec = (
        f"WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: http://m.example/\r\n"
        f"Content-Length: {len(http)}\r\n"
    ).encode() + b"\r\n" + http + b"\r\n\r\n"
    (tmp_path / "m.warc").write_bytes(rec)
    row = read_warc_html(spark, str(tmp_path)).first()
    assert "x y" in row["text"]  # full text keeps the nav
    assert row["main_text"] == (
        "genuine article content with a good number of words here"
    )
