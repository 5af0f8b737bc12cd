"""E11: PDF location extractor (pdf-extractor.service.js:43-298).

Operates on extracted PDF TEXT. The binary front-end
(``sources/pdf_bytes.py``: read_binary_files -> stdlib FlateDecode text
extraction -> this module, mirroring the reference's arraybuffer +
pdf-parse path, pdf-extractor.service.js:9-38) covers digitally-born
text PDFs; the synthetic world additionally ships pre-extracted text.

Strategies transcribed: multilingual keyword blocks (EN/ES/NL/DE/FR,
next-5-lines window), 4 regex families (US city-state-zip, UK postcode,
NL postcode, generic street w/ context windows), section headers with
3-line grouping, ``hasAddressComponents`` 6-indicator gate, dedup on
squashed address (len > 5).
"""

from __future__ import annotations

import re

ADDRESS_KEYWORDS = (
    "office", "headquarters", "location", "address", "branch",
    "oficina", "sede", "dirección", "sucursal",
    "bureau", "adres", "vestiging", "kantoor",
    "büro", "adresse", "niederlassung",
    "siège",
)

SECTION_HEADERS = (
    re.compile(r"our\s+offices?", re.I),
    re.compile(r"our\s+locations?", re.I),
    re.compile(r"branch\s+offices?", re.I),
    re.compile(r"contact\s+information", re.I),
    re.compile(r"global\s+presence", re.I),
    re.compile(r"office\s+locations?", re.I),
)

_COMPONENT_RES = (
    re.compile(r"\d{1,5}\s+[A-Z]", re.I),
    re.compile(r"\d{5}(?:-\d{4})?"),
    re.compile(r"\d{4}\s*[A-Z]{2}", re.I),
    re.compile(r"[A-Z]{1,2}\d{1,2}[A-Z]?\s*\d[A-Z]{2}", re.I),
    re.compile(r"tel:?|phone:?|fax:?", re.I),
    re.compile(r"(?:street|st|avenue|ave|road|rd|boulevard|blvd|drive|dr|lane|ln)", re.I),
)

_US_RE = re.compile(r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*),\s*([A-Z]{2})\s+(\d{5}(?:-\d{4})?)")
_UK_RE = re.compile(r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*),?\s*([A-Z]{1,2}\d{1,2}[A-Z]?\s*\d[A-Z]{2})")
_NL_RE = re.compile(r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*),?\s*(\d{4}\s*[A-Z]{2})")
_STREET_RE = re.compile(
    r"\d+\s+[A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,4}(?:\s+(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Drive|Dr|Lane|Ln|Way|Court|Ct))?",
    re.I)
_NOT_NAME_RE = re.compile(r"\d{5}|\d{4}\s*[A-Z]{2}", re.I)


def has_address_components(text: str) -> bool:
    return any(rx.search(text) for rx in _COMPONENT_RES)


def _context(text: str, index: int, length: int) -> str:
    start = max(0, index - length // 2)
    end = min(len(text), index + length // 2)
    return text[start:end]


def _location_name(context: str) -> str:
    lines = [l.strip() for l in context.split("\n") if l.strip()]
    for line in lines:
        if 5 < len(line) < 100 and not _NOT_NAME_RE.search(line) and "," not in line:
            return line
    return lines[0] if lines else "Location"


def extract_pdf_locations(text: str, source_url: str) -> list[dict]:
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    out: list[dict] = []

    # Strategy 1: keyword blocks (:68-101)
    for i in range(max(0, len(lines) - 3)):
        low = lines[i].lower()
        if any(k in low for k in ADDRESS_KEYWORDS):
            block = "\n".join(lines[i:i + 6])
            if has_address_components(block):
                out.append({"name": lines[i],
                            "address": ", ".join(lines[i + 1:i + 5]),
                            "postal_code": "", "country": ""})

    # Strategy 2: regex families with context windows (:106-170)
    for m in _US_RE.finditer(text):
        ctx = _context(text, m.start(), 200)
        out.append({"name": _location_name(ctx) or m.group(1),
                    "address": m.group(0), "city": m.group(1),
                    "state": m.group(2), "postal_code": m.group(3),
                    "country": "USA"})
    for m in _UK_RE.finditer(text):
        ctx = _context(text, m.start(), 200)
        out.append({"name": _location_name(ctx) or m.group(1),
                    "address": m.group(0), "postal_code": m.group(2),
                    "country": "GBR"})
    for m in _NL_RE.finditer(text):
        ctx = _context(text, m.start(), 200)
        out.append({"name": _location_name(ctx) or m.group(1),
                    "address": m.group(0), "postal_code": m.group(2),
                    "country": "NLD"})
    for m in _STREET_RE.finditer(text):
        ctx = _context(text, m.start(), 300)
        if has_address_components(ctx):
            out.append({"name": _location_name(ctx), "address": ctx[:200],
                        "postal_code": "", "country": ""})

    # Strategy 3: section headers + 3-line grouping (:175-212)
    for i, line in enumerate(lines):
        if any(rx.search(line) for rx in SECTION_HEADERS):
            sec = lines[i + 1:i + 21]
            for j in range(0, max(0, len(sec) - 2), 3):
                cand = ", ".join(sec[j:j + 3])
                if has_address_components(cand):
                    out.append({"name": sec[j],
                                "address": ", ".join(sec[j + 1:j + 3]),
                                "postal_code": "", "country": ""})

    # dedup on squashed address, key len > 5 (:284-298)
    seen: set[str] = set()
    unique = []
    for loc in out:
        key = re.sub(r"\s+", "", (loc.get("address") or "").lower())
        if key not in seen and len(key) > 5:
            seen.add(key)
            unique.append(loc)

    rows = []
    for r in unique:
        rows.append({
            "name": r.get("name") or "", "address": r.get("address") or "",
            "street": "", "city": r.get("city") or "", "state": r.get("state") or "",
            "postal_code": r.get("postal_code") or "", "country": r.get("country") or "",
            "latitude": "", "longitude": "", "phone": "", "email": "",
            "source_url": source_url, "extraction_method": "pdf",
            "confidence": 0.80,
        })
    return rows
