"""Pure-Python executable specification of the reference's scalar semantics.

Independent re-implementation of the byte machines described in SURVEY.md
§2.2-2.3 (reference scanner.go:18-151, parser.go:143-171), used as the test
oracle for the Spark expression implementations — including property-based
equivalence over adversarial inputs.
"""

from __future__ import annotations

BEL = 0x07
ESC = 0x1B


def parse_line(line: str):
    """→ (timestamp_ms | None, content, error | None). scanner.go:18-71."""
    import re

    data = line.encode("utf-8", "surrogatepass")
    if len(data) < 10:
        return None, line, None
    if not (data[0] == ESC and data[1:7] == b"_bk;t="):
        return None, line, None
    bel = data.find(b"\x07", 7)
    if bel == -1:
        return None, line, None
    ts_bytes = data[7:bel]
    # Go strconv.ParseInt: optional sign + decimal digits, int64 range.
    if not re.fullmatch(rb"[+-]?[0-9]+", ts_bytes):
        return None, None, f"invalid timestamp: {ts_bytes!r}"
    ts = int(ts_bytes.decode("ascii"), 10)
    if not (-(2**63) <= ts < 2**63):
        return None, None, f"invalid timestamp: {ts_bytes!r}"
    content = data[bel + 1 :].decode("utf-8", "surrogatepass")
    return ts, content, None


def strip_ansi(content: str) -> str:
    """scanner.go:94-151 byte machine, ported statement-for-statement from
    the documented behavior (branch 1: ESC[ skip-to-letter; branch 2:
    ESC-less [ + <=8 digits/; + letter within 10-byte lookahead)."""
    data = content.encode("utf-8", "surrogatepass")
    out = bytearray()
    i = 0
    n = len(data)

    def is_final(b: int) -> bool:
        return (0x41 <= b <= 0x5A) or (0x61 <= b <= 0x7A)

    while i < n:
        if i < n - 1 and data[i] == ESC and data[i + 1] == ord("["):
            i += 2
            while i < n and not is_final(data[i]):
                i += 1
            if i < n:
                i += 1
        elif i < n - 1 and data[i] == ord("["):
            j = i + 1
            valid = False
            while j < n and j < i + 10:
                b = data[j]
                if (0x30 <= b <= 0x39) or b == ord(";"):
                    j += 1
                elif is_final(b):
                    valid = True
                    break
                else:
                    break
            if valid:
                i = j + 1
            else:
                out.append(data[i])
                i += 1
        else:
            out.append(data[i])
            i += 1
    return out.decode("utf-8", "surrogatepass")


def is_command(content: str) -> bool:
    return strip_ansi(content).startswith("$ ")


def is_group(content: str) -> bool:
    c = strip_ansi(content)
    return c.startswith("~~~") or c.startswith("---") or c.startswith("+++")


def is_progress(content: str) -> bool:
    if "[K" not in content:
        return False
    c = strip_ansi(content)
    return "objects" in c or "deltas" in c or "%" in c


def run_pipeline(lines: list[str]):
    """Full sequential reference pipeline incl. group propagation
    (parser.go:41-56). Returns list of dict rows; error rows carry
    ``parse_error`` and do not update group state."""
    group = ""
    rows = []
    for i, line in enumerate(lines):
        ts, content, err = parse_line(line)
        if err is not None:
            rows.append({"line_no": i, "parse_error": err})
            continue
        if is_group(content):
            group = strip_ansi(content)
        # parquet.go:63: at-rest timestamp is UnixMilli() of the in-flight
        # time.Time; a non-OSC line leaves the Go zero time (year 1) →
        # -62135596800000 ms.  HasTimestamp = !IsZero() (parser.go:138-140),
        # i.e. the stored value differs from that sentinel (t=0 is epoch
        # 1970 — a real instant, HasTimestamp true).
        sentinel = -62135596800000
        at_rest = ts if ts is not None else sentinel
        rows.append(
            {
                "line_no": i,
                "timestamp": at_rest,
                "content": content,
                "group": group,
                "has_timestamp": at_rest != sentinel,
                "is_command": is_command(content),
                "is_group": is_group(content),
                "is_progress": is_progress(content),
                "parse_error": None,
            }
        )
    return rows
