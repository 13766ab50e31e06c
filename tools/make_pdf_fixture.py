"""Generate the packaged travel_ban.pdf fixture from travel_ban.txt.

Produces a classic-xref two-page PDF whose page 1 content stream is
FlateDecode-compressed and page 2 uncompressed — covering both filter
paths of sources/pdf_text.py. Text is drawn one source line per
``Tj``/``TJ`` with ``T*`` line moves, parens/backslashes escaped, so
the vendored extractor round-trips the fixture text exactly.

Usage: python tools/make_pdf_fixture.py
"""

from __future__ import annotations

import os
import zlib


def _esc(line: str) -> str:
    return (line.replace("\\", r"\\")
            .replace("(", r"\(").replace(")", r"\)"))


def page_stream(lines: list[str], use_tj_array_every: int = 5) -> bytes:
    ops = ["BT", "/F1 10 Tf", "12 TL", "50 780 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("T*")
        body = _esc(line.encode("latin-1", "replace").decode("latin-1"))
        if i % use_tj_array_every == 2 and len(body) > 4:
            mid = len(body) // 2
            # avoid splitting inside an escape sequence
            while mid > 1 and body[mid - 1] == "\\":
                mid -= 1
            ops.append(f"[({body[:mid]}) -20 ({body[mid:]})] TJ")
        else:
            ops.append(f"({body}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def build_pdf(text: str) -> bytes:
    lines = text.split("\n")
    half = (len(lines) + 1) // 2
    raw1, raw2 = page_stream(lines[:half]), page_stream(lines[half:])
    flate1 = zlib.compress(raw1)

    objects: list[bytes] = []

    def obj(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font = obj(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    c1 = obj(b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(flate1)
             + flate1 + b"\nendstream")
    c2 = obj(b"<< /Length %d >>\nstream\n" % len(raw2) + raw2 + b"\nendstream")
    pages_num = len(objects) + 3  # two page objects follow, then Pages
    p1 = obj(b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
             % (pages_num, font, c1))
    p2 = obj(b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
             % (pages_num, font, c2))
    pages = obj(b"<< /Type /Pages /Kids [%d 0 R %d 0 R] /Count 2 >>" % (p1, p2))
    catalog = obj(b"<< /Type /Catalog /Pages %d 0 R >>" % pages)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, catalog, xref_at))
    return bytes(out)


def column_stream(columns: list[list[str]], xs: list[int],
                  top_y: int = 760) -> bytes:
    """One page content stream drawing each column as its own BT/ET
    block positioned with an absolute Tm (the way real layout engines
    place columns), lines advanced with T*; every 4th line renders as
    a hex string and every 5th as a kerned TJ array so the extractor's
    string-form coverage is exercised under the layout too."""
    ops: list[str] = []
    for col, x in zip(columns, xs):
        ops += ["BT", "/F1 9 Tf", "11 TL", f"1 0 0 1 {x} {top_y} Tm"]
        for i, line in enumerate(col):
            if i:
                ops.append("T*")
            body = line.encode("latin-1", "replace").decode("latin-1")
            if i % 4 == 3:
                ops.append(f"<{body.encode('latin-1').hex()}> Tj")
            elif i % 5 == 2 and len(body) > 4:
                esc = _esc(body)
                mid = len(esc) // 2
                while mid > 1 and esc[mid - 1] == "\\":
                    mid -= 1
                ops.append(f"[({esc[:mid]}) -15 ({esc[mid:]})] TJ")
            else:
                ops.append(f"({_esc(body)}) Tj")
        ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def build_layout_pdf(text: str) -> bytes:
    """Two-page, two-column-per-page PDF of the layout fixture text:
    page 1 FlateDecode, page 2 uncompressed; columns positioned via Tm
    (multi-column EU-gazette layout), hyphenated soft-wrapped lines
    preserved verbatim. Stream order is reading order (col 1 then
    col 2), matching how the EU travel-ban PDFs are generated."""
    lines = text.split("\n")
    half = (len(lines) + 1) // 2
    p1_lines, p2_lines = lines[:half], lines[half:]

    def cols(ls: list[str]) -> list[list[str]]:
        c = (len(ls) + 1) // 2
        return [ls[:c], ls[c:]]

    raw1 = column_stream(cols(p1_lines), [40, 310])
    raw2 = column_stream(cols(p2_lines), [40, 310])
    flate1 = zlib.compress(raw1)

    objects: list[bytes] = []

    def obj(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font = obj(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    c1 = obj(b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(flate1)
             + flate1 + b"\nendstream")
    c2 = obj(b"<< /Length %d >>\nstream\n" % len(raw2) + raw2 + b"\nendstream")
    pages_num = len(objects) + 3
    p1 = obj(b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
             % (pages_num, font, c1))
    p2 = obj(b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
             % (pages_num, font, c2))
    pages = obj(b"<< /Type /Pages /Kids [%d 0 R %d 0 R] /Count 2 >>" % (p1, p2))
    catalog = obj(b"<< /Type /Catalog /Pages %d 0 R >>" % pages)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, catalog, xref_at))
    return bytes(out)


def main() -> None:
    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "sanctions_data_pipeline_spark",
        "data", "fixtures")
    with open(os.path.join(fixtures, "travel_ban.txt"), encoding="utf-8") as fh:
        text = fh.read()
    pdf = build_pdf(text)
    out_path = os.path.join(fixtures, "travel_ban.pdf")
    with open(out_path, "wb") as fh:
        fh.write(pdf)
    print(f"wrote {out_path} ({len(pdf)} bytes)")
    with open(os.path.join(fixtures, "travel_ban_layout.txt"),
              encoding="utf-8") as fh:
        layout_text = fh.read().rstrip("\n")
    layout_pdf = build_layout_pdf(layout_text)
    layout_path = os.path.join(fixtures, "travel_ban_layout.pdf")
    with open(layout_path, "wb") as fh:
        fh.write(layout_pdf)
    print(f"wrote {layout_path} ({len(layout_pdf)} bytes)")


if __name__ == "__main__":
    main()
