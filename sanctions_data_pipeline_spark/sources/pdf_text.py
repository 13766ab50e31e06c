"""Minimal vendored PDF text extractor (public PDF-spec subset).

The reference pipeline's PDF step (main.py:250-258) concatenates
per-page text with PyPDF2. That library isn't in this image, so this
module vendors a small extractor covering the document class the EU
travel-ban PDFs (and the repo fixture) fall into:

- classic cross-reference PDFs whose content streams are either
  uncompressed or FlateDecode (zlib) — no object streams, no
  encryption, no predictors;
- text drawn with the standard operators ``Tj``, ``'``, ``\"`` and
  ``TJ`` using literal ``( )`` strings (with escapes) or ``< >`` hex
  strings in a Latin-1-compatible single-byte encoding;
- line structure recovered from ``Td``/``TD``/``T*`` moves and
  ``BT``/``ET`` blocks.

When ``pypdf`` IS importable it is preferred at runtime (same
feature-detection pattern as the multimodal codecs); the vendored path
is the deterministic fallback and is what the fixture tests pin.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\n?endstream", re.S)
_OP_RE = re.compile(r"[A-Za-z'\"*]+")

# operators that move to a new line before/while showing text. Tm
# (set text matrix) is how real layout engines jump between columns
# and absolute line positions — treating it as a line move keeps
# multi-column EU-layout documents (fixture travel_ban_layout.pdf)
# from concatenating a column start onto the previous column's last
# line. Stream order is reading order for these documents, matching
# the reference's PyPDF2 page-concat semantics (main.py:250-258).
_NEWLINE_OPS = {"Td", "TD", "T*", "Tm", "'", '"'}
_SHOW_OPS = {"Tj", "TJ", "'", '"'}


def _literal_string(s: str, i: int) -> tuple[str, int]:
    """Parse a ``( ... )`` literal at s[i] == '('; return (text, end)."""
    depth, buf = 1, []
    i += 1
    n = len(s)
    while i < n and depth:
        ch = s[i]
        if ch == "\\":
            i += 1
            if i >= n:
                break
            e = s[i]
            if e == "n":
                buf.append("\n")
            elif e == "r":
                buf.append("\r")
            elif e == "t":
                buf.append("\t")
            elif e in "()\\":
                buf.append(e)
            elif e.isdigit():
                octal = e
                while len(octal) < 3 and i + 1 < n and s[i + 1].isdigit():
                    i += 1
                    octal += s[i]
                buf.append(chr(int(octal, 8) & 0xFF))
            elif e == "\n":
                pass  # line continuation
            else:
                buf.append(e)
            i += 1
        elif ch == "(":
            depth += 1
            buf.append(ch)
            i += 1
        elif ch == ")":
            depth -= 1
            if depth:
                buf.append(ch)
            i += 1
        else:
            buf.append(ch)
            i += 1
    return "".join(buf), i


def _content_text(content: str) -> str:
    """Replay text-showing operators of one decoded content stream."""
    out: list[str] = []
    pending: list[str] = []
    at_line_start = True
    i, n = 0, len(content)
    while i < n:
        ch = content[i]
        if ch == "(":
            text, i = _literal_string(content, i)
            pending.append(text)
        elif ch == "<" and i + 1 < n and content[i + 1] != "<":
            j = content.find(">", i)
            if j == -1:
                break
            hexs = re.sub(r"\s", "", content[i + 1:j])
            if len(hexs) % 2:
                hexs += "0"
            try:
                pending.append(bytes.fromhex(hexs).decode("latin-1"))
            except ValueError:
                pass
            i = j + 1
        elif ch == "<":  # '<<' dict
            i += 2
        elif ch == "%":  # comment to EOL
            j = content.find("\n", i)
            i = n if j == -1 else j + 1
        else:
            m = _OP_RE.match(content, i)
            if not m:
                i += 1
                continue
            op = m.group(0)
            i = m.end()
            if op in _NEWLINE_OPS and not at_line_start:
                out.append("\n")
                at_line_start = True
            if op in _SHOW_OPS:
                shown = "".join(pending)
                if shown:
                    out.append(shown)
                    at_line_start = False
            if op == "ET" and not at_line_start:
                out.append("\n")
                at_line_start = True
            pending.clear()
    return "".join(out)


def extract_text_from_pdf_bytes(data: bytes) -> str:
    """All text from one PDF's content streams, page streams in file
    order, '\\n'-joined — the reference's page-concat shape
    (main.py:250-258)."""
    try:
        import pypdf  # noqa: F401  (preferred when present)

        from io import BytesIO

        reader = pypdf.PdfReader(BytesIO(data))
        return "\n".join((page.extract_text() or "") for page in reader.pages)
    except ImportError:
        pass
    pages: list[str] = []
    for m in _STREAM_RE.finditer(data):
        header, body = m.group(1), m.group(2)
        if b"FlateDecode" in header:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        elif b"/Filter" in header:
            continue  # unsupported filter
        try:
            content = body.decode("latin-1")
        except UnicodeDecodeError:
            continue
        if "BT" not in content:
            continue  # not a text content stream
        text = _content_text(content).strip("\n")
        if text:
            pages.append(text)
    return "\n".join(pages)
