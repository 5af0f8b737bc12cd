"""PDF binary source path (S7/E11 front-end).

Reference shape: pdf-extractor.service.js:9-38 downloads the PDF as an
arraybuffer and runs pdf-parse to get plain text, which feeds the E11
location strategies. Here the same path is:

    ray.data.read_binary_files(dir)           # bytes stay in blocks
      -> PdfTextStage (map_batches)           # stdlib text extraction
      -> stages.extract_pdf.extract_pdf_locations

``pdf_extract_text`` is a minimal stdlib extractor for digitally-born
text PDFs: it scans ``stream...endstream`` segments, inflates
FlateDecode streams with zlib, and collects the text-show operators
(Tj, ', ", TJ) from content streams, emitting a newline per text-line
operator (Td/TD/T*/ET). It is NOT a full PDF parser (no xref chasing,
no CID fonts, no encryption) — the class of PDF pdf-parse handles that
this sandbox can cover without a pdf lib; anything else yields "" and
the page is skipped, mirroring the reference's catch-and-skip.
"""

from __future__ import annotations

import re
import zlib

import pyarrow as pa

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.S)

# one content-stream token: hex string, literal string (with escapes
# handled separately), or an operator/word
_TOKEN_RE = re.compile(rb"<[0-9A-Fa-f\s]*>|\(|[A-Za-z'\"*]+|\[|\]")

_ESCAPES = {ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
            ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\"}


def _read_literal(data: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF literal string starting AFTER the opening '(' at i.
    Returns (text, index after closing paren). Handles \\-escapes and
    nested parens per the spec."""
    out: list[str] = []
    depth = 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = data[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal \ddd
                j = i + 1
                oct_s = ""
                while j < n and len(oct_s) < 3 and 0x30 <= data[j] <= 0x37:
                    oct_s += chr(data[j])
                    j += 1
                out.append(chr(int(oct_s, 8)))
                i = j
            else:
                i += 1  # line continuation / unknown escape: drop backslash
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _hex_to_text(tok: bytes) -> str:
    hx = re.sub(rb"\s", b"", tok[1:-1])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1")
    except ValueError:
        return ""


def _content_text(content: bytes) -> list[str]:
    """Text lines from one content stream: strings shown by Tj/'/"/TJ in
    encounter order; Td/TD/T*/ET start a new line (pdf-parse-like)."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[str] = []  # strings seen since the last operator

    def newline():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    i = 0
    n = len(content)
    while i < n:
        m = _TOKEN_RE.search(content, i)
        if m is None:
            break
        tok = m.group(0)
        if tok == b"(":
            s, i = _read_literal(content, m.end())
            pending.append(s)
            continue
        i = m.end()
        if tok.startswith(b"<"):
            pending.append(_hex_to_text(tok))
        elif tok in (b"Tj", b"'", b'"', b"TJ"):
            if tok in (b"'", b'"'):
                newline()
            cur.extend(pending)
            pending.clear()
        elif tok in (b"Td", b"TD", b"T*", b"ET"):
            pending.clear()
            newline()
        elif tok in (b"[", b"]"):
            pass  # TJ array delimiters; strings already collected
        else:
            pending.clear()  # other operator: its string operands weren't text
    newline()
    return lines


def pdf_extract_text(data: bytes) -> str:
    """Plain text of a digitally-born PDF (stdlib only); "" when nothing
    decodable is found (caller skips, like the reference's catch)."""
    if not data.startswith(b"%PDF"):
        return ""
    lines: list[str] = []
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        try:
            content = zlib.decompress(raw)
        except zlib.error:
            content = raw
        if b"BT" not in content and b"Tj" not in content and b"TJ" not in content:
            continue
        lines.extend(_content_text(content))
    return "\n".join(l for l in lines if l.strip())


class PdfTextStage:
    """map_batches stage over ``read_binary_files`` output: (path, bytes)
    -> (source_url, text). Stateless; bytes never leave the task."""

    def __init__(self, bytes_col: str = "bytes", path_col: str = "path"):
        self.bytes_col, self.path_col = bytes_col, path_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.bytes_col).to_pylist()
        paths = (batch.column(self.path_col).to_pylist()
                 if self.path_col in batch.column_names
                 else [""] * len(payloads))
        texts = [pdf_extract_text(b or b"") for b in payloads]
        return pa.table({"source_url": pa.array(paths, pa.string()),
                         "text": pa.array(texts, pa.large_string())})


def pdf_locations(ds) -> "pa.Table":
    """Full E11 binary path as Dataset stages: bytes -> text -> locations.
    Returns a Dataset of location rows (pdf-extractor.service.js:43-298
    semantics via stages/extract_pdf.extract_pdf_locations)."""
    from ..stages.extract_pdf import extract_pdf_locations

    cols = ["name", "address", "street", "city", "state", "postal_code",
            "country", "latitude", "longitude", "phone", "email",
            "source_url", "extraction_method"]

    def extract(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for url, text in zip(batch.column("source_url").to_pylist(),
                             batch.column("text").to_pylist()):
            if text:
                rows.extend(extract_pdf_locations(text, url))
        # same schema for empty and non-empty blocks (an undecodable PDF
        # yields an empty block; schemas must still unify downstream)
        return pa.table({c: pa.array([str(r.get(c, "")) for r in rows],
                                     pa.string()) for c in cols})

    return (ds.map_batches(PdfTextStage(), batch_format="pyarrow")
              .map_batches(extract, batch_format="pyarrow"))


# --- fixture generator (tests; no pdf lib in the sandbox) --------------------

def make_simple_pdf(lines: list[str]) -> bytes:
    """A valid single-page PDF with a FlateDecode content stream showing
    ``lines`` via Tj/Td — enough structure for any conforming reader, and
    the exact class pdf_extract_text targets."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for k, line in enumerate(lines):
        if k:
            ops.append("0 -14 Td")
        ops.append(f"({esc(line)}) Tj")
    ops.append("ET")
    content = zlib.compress("\n".join(ops).encode("latin-1"))

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() +
        b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
