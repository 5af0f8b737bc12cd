"""S12: minimal XLSX sink (bulk-processor.service.js:127-240).

No Excel library ships in this sandbox, but XLSX is a zip of XML parts
(ECMA-376, public spec) — this stdlib-only writer produces a valid
2-sheet workbook matching the reference's layout AND its styling:
- fixed column sets with the reference's display headers and widths
  (Summary :131-138, All Locations :166-183, emitted as <cols>);
- Summary.status filled green (FF90EE90) on success / light red
  (FFFFCCCB) otherwise (:149-161) and an Error column (`error || ''`);
- All Locations value transforms: phone/email arrays joined ', ',
  hours '; ', qualityScore rendered `${Math.round(q)}%` (falsy → '')
  with the fill band decided on the RAW score (:186-224): green >=90 /
  sky blue (FF87CEEB) >=70 / orange (FFFFA500) >=50;
- bold white-on-blue (FF4472C4) header rows (:230-238).
Inline strings; styles via a minimal styles.xml.
"""

from __future__ import annotations

import math
import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>
<sheet name="Summary" sheetId="1" r:id="rId1"/>
<sheet name="All Locations" sheetId="2" r:id="rId2"/>
</sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""

# style indices (cellXfs): 1=green fill, 2=light red, 3=sky blue,
# 4=orange, 5=header (bold white on FF4472C4) — argb values verbatim
# from bulk-processor.service.js:149-238
S_GREEN, S_RED, S_BLUE, S_ORANGE, S_HEADER = 1, 2, 3, 4, 5

_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="2"><font/><font><b/><color rgb="FFFFFFFF"/></font></fonts>
<fills count="7">
<fill><patternFill patternType="none"/></fill>
<fill><patternFill patternType="gray125"/></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FF90EE90"/></patternFill></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FFFFCCCB"/></patternFill></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FF87CEEB"/></patternFill></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FFFFA500"/></patternFill></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FF4472C4"/></patternFill></fill>
</fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
<cellXfs count="6">
<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>
<xf numFmtId="0" fontId="0" fillId="2" borderId="0" xfId="0" applyFill="1"/>
<xf numFmtId="0" fontId="0" fillId="3" borderId="0" xfId="0" applyFill="1"/>
<xf numFmtId="0" fontId="0" fillId="4" borderId="0" xfId="0" applyFill="1"/>
<xf numFmtId="0" fontId="0" fillId="5" borderId="0" xfId="0" applyFill="1"/>
<xf numFmtId="0" fontId="1" fillId="6" borderId="0" xfId="0" applyFill="1" applyFont="1"/>
</cellXfs>
</styleSheet>"""


def _cell(value, s: int = 0) -> str:
    attr = f' s="{s}"' if s else ""
    if value is None:
        return f"<c{attr}/>"
    if isinstance(value, bool):
        return f'<c{attr} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f"<c{attr}><v>{value}</v></c>"
    return f'<c{attr} t="inlineStr"><is><t>{escape(str(value))}</t></is></c>'


def _sheet_xml(headers: list[str], widths: list[int],
               rows: list[list]) -> str:
    """rows are lists of (value, cellXfs index) pairs; widths become the
    reference's per-column customWidth <cols> entries."""
    cols = "".join(
        f'<col min="{i + 1}" max="{i + 1}" width="{w}" customWidth="1"/>'
        for i, w in enumerate(widths))
    body = ["<row>" + "".join(_cell(h, S_HEADER) for h in headers) + "</row>"]
    for r in rows:
        body.append("<row>" + "".join(_cell(v, s) for v, s in r) + "</row>")
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<cols>{cols}</cols>"
            "<sheetData>" + "".join(body) + "</sheetData></worksheet>")


# (display header, row key, width) — verbatim from
# bulk-processor.service.js:131-138 (Summary) and :166-183 (All Locations)
SUMMARY_COLS = [
    ("Company Name", "companyName", 30), ("URL", "url", 40),
    ("Status", "status", 15), ("Locations Found", "locationsCount", 15),
    ("Error", "error", 40),
]
LOCATION_COLS = [
    ("Company", "company", 25), ("Location Name", "locationName", 30),
    ("Address", "locationAddress", 40), ("City", "streetOrCity", 20),
    ("State", "state", 15), ("Postcode", "postcode", 12),
    ("Country", "countryIso3", 10), ("Latitude", "latitude", 12),
    ("Longitude", "longitude", 12), ("Phone", "phone", 20),
    ("Email", "email", 30), ("Hours", "hours", 25),
    ("Quality Score", "qualityScore", 15), ("Source URL", "sourceUrl", 40),
]
# this engine's enriched records use snake_case names; first present,
# non-None alias wins
_LOC_ALIASES = {
    "company": ("company", "company_name"),
    "locationName": ("locationName", "location_name", "name"),
    "locationAddress": ("locationAddress", "location_address", "address"),
    "streetOrCity": ("streetOrCity", "street_or_city", "city", "street"),
    "state": ("state",),
    "postcode": ("postcode", "postal_code"),
    "countryIso3": ("countryIso3", "country_iso3", "country"),
    "latitude": ("latitude",),
    "longitude": ("longitude",),
    "phone": ("phone",),
    "email": ("email",),
    "hours": ("hours",),
    "qualityScore": ("qualityScore", "quality_score"),
    "sourceUrl": ("sourceUrl", "source_url"),
}


def _loc_get(row: dict, key: str):
    for k in _LOC_ALIASES[key]:
        if row.get(k) is not None:
            return row[k]
    return None


def _quality_band(q) -> int:
    """bulk-processor.service.js:205-224 — fill band on the RAW score."""
    try:
        q = float(q)
    except (TypeError, ValueError):
        return 0
    if q >= 90:
        return S_GREEN
    if q >= 70:
        return S_BLUE
    if q >= 50:
        return S_ORANGE
    return 0


def _location_cells(row: dict) -> list:
    cells = []
    for _, key, _ in LOCATION_COLS:
        v = _loc_get(row, key)
        style = 0
        if key in ("phone", "email") and isinstance(v, (list, tuple)):
            v = ", ".join(str(x) for x in v)       # :198-199
        elif key == "hours" and isinstance(v, (list, tuple)):
            v = "; ".join(str(x) for x in v)       # :200
        elif key == "qualityScore":
            style = _quality_band(v)
            # `${Math.round(q)}%` on truthy, else '' (:201); JS rounds
            # half UP (Python round() half-evens, so floor(q+0.5))
            try:
                v = f"{math.floor(float(v) + 0.5)}%" if v else ""
            except (TypeError, ValueError):
                v = ""
        cells.append((v, style))
    return cells


def write_bulk_workbook(path: str, summary_rows: list[dict],
                        location_rows: list[dict]) -> None:
    """2-sheet workbook: Summary (Company Name/URL/Status/Locations
    Found/Error) + All Locations (the reference's fixed 14-column
    layout), both with its widths, header style and cell fills."""
    s_rows = []
    for r in summary_rows:
        status_fill = S_GREEN if r.get("status") == "success" else S_RED
        s_rows.append([
            (r.get(k), status_fill if k == "status" else 0)
            if k != "error" else (r.get("error") or "", 0)   # :146 `|| ''`
            for _, k, _ in SUMMARY_COLS])
    l_rows = [_location_cells(r) for r in location_rows]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/styles.xml", _STYLES)
        z.writestr("xl/worksheets/sheet1.xml",
                   _sheet_xml([h for h, _, _ in SUMMARY_COLS],
                              [w for _, _, w in SUMMARY_COLS], s_rows))
        z.writestr("xl/worksheets/sheet2.xml",
                   _sheet_xml([h for h, _, _ in LOCATION_COLS],
                              [w for _, _, w in LOCATION_COLS], l_rows))
