"""S12: minimal XLSX sink (bulk-processor.service.js:127-240).

No Excel library ships in this sandbox, but XLSX is a zip of XML parts
(ECMA-376, public spec) — this stdlib-only writer produces a valid
2-sheet workbook matching the reference's layout AND its color coding:
Summary.status filled green (FF90EE90) on success / light red
(FFFFCCCB) otherwise (:149-161), All Locations quality filled green
>=90 / sky blue (FF87CEEB) >=70 / orange (FFFFA500) >=50 (:205-224),
and bold white-on-blue (FF4472C4) header rows (:230-238). Inline
strings; styles via a minimal styles.xml.
"""

from __future__ import annotations

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


def _sheet_xml(header: list[str], rows: list[list],
               style_fn=None) -> str:
    """style_fn(row_values, col_name) -> cellXfs index (0 = default)."""
    body = ["<row>" + "".join(_cell(h, S_HEADER) for h in header) + "</row>"]
    for r in rows:
        row_d = dict(zip(header, r)) if style_fn else None
        cells = [_cell(v, style_fn(row_d, col) if style_fn else 0)
                 for col, v in zip(header, r)]
        body.append("<row>" + "".join(cells) + "</row>")
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<sheetData>" + "".join(body) + "</sheetData></worksheet>")


def _summary_style(row: dict, col: str) -> int:
    """bulk-processor.service.js:149-161 — status cell fill."""
    if col != "status":
        return 0
    return S_GREEN if row.get("status") == "success" else S_RED


def _quality_style(row: dict, col: str) -> int:
    """bulk-processor.service.js:205-224 — quality-score cell fill."""
    if col not in ("quality_score", "qualityScore"):
        return 0
    try:
        q = float(row.get(col) or 0)
    except (TypeError, ValueError):
        return 0
    if q >= 90:
        return S_GREEN
    if q >= 70:
        return S_BLUE
    if q >= 50:
        return S_ORANGE
    return 0


def write_bulk_workbook(path: str, summary_rows: list[dict],
                        location_rows: list[dict]) -> None:
    """2-sheet workbook: Summary (companyName/url/status/locationsCount) +
    All Locations (every enriched record column)."""
    s_header = ["companyName", "url", "status", "locationsCount"]
    s_rows = [[r.get(k) for k in s_header] for r in summary_rows]
    l_header = sorted({k for r in location_rows for k in r}) if location_rows else []
    l_rows = [[r.get(k) for k in l_header] for r in location_rows]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/styles.xml", _STYLES)
        z.writestr("xl/worksheets/sheet1.xml",
                   _sheet_xml(s_header, s_rows, style_fn=_summary_style))
        z.writestr("xl/worksheets/sheet2.xml",
                   _sheet_xml(l_header, l_rows, style_fn=_quality_style))
