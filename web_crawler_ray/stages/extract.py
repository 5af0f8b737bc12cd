"""Extractor stages (SURVEY §2.3) — stateless per-document flat-maps.

Each extractor is a pure function ``(Doc, url) -> list[dict]`` with the
reference's semantics transcribed (citations inline). The Ray stage
``ExtractStage`` is a callable class for ``map_batches``: regexes and
the extractor registry are bound once per actor in ``__init__``; each
``__call__`` parses a batch of pages (one DOM parse per page, shared by
every extractor + span assembly) and emits exploded ``locations_raw``
rows — the 1→N flat-map expressed as a batch transform.

Confidence tagging follows the orchestrator (crawler.service.js):
json-ld 0.95 / microdata 0.90 inside E1-E2; the LocationExtractor
family is tagged 0.80 by the caller (:336-339); heuristic rows keep
their per-strategy confidences and the ≥0.75 caller gate (P2) is a
downstream filter; maps 0.90 (:349-380); XHR 0.85 (:382-398).
"""

from __future__ import annotations

import json
import re
from urllib.parse import parse_qs, urlsplit

import numpy as np
import pyarrow as pa

from ..functions.domlite import Doc, Node, parse

# ---------------------------------------------------------------------------
# E1: JSON-LD (structured-data-extractor.service.js:31-161)
# ---------------------------------------------------------------------------

_JSONLD_TYPES = (
    "LocalBusiness", "Organization", "Place", "PostalAddress", "Store",
    "OfficeLocation", "CorporateHeadquarters", "BusinessPlace", "BranchOffice",
)


def _is_location_schema(obj) -> bool:
    if not isinstance(obj, dict) or "@type" not in obj or not obj["@type"]:
        return False
    types = obj["@type"] if isinstance(obj["@type"], list) else [obj["@type"]]
    return any(isinstance(t, str) and any(lt in t for lt in _JSONLD_TYPES) for t in types)


def _parse_schema_object(schema: dict, url: str) -> dict | None:
    loc = {
        "name": schema.get("name") or schema.get("legalName") or "",
        "address": "", "street": "", "city": "", "state": "",
        "postal_code": "", "country": "", "latitude": "", "longitude": "",
        "phone": "", "email": "",
        "source_url": url, "extraction_method": "json-ld", "confidence": 0.95,
    }
    addr = schema.get("address")
    if addr:
        if isinstance(addr, str):
            loc["address"] = addr
        elif isinstance(addr, dict):
            loc["street"] = addr.get("streetAddress") or ""
            loc["city"] = addr.get("addressLocality") or ""
            loc["state"] = addr.get("addressRegion") or ""
            loc["postal_code"] = str(addr.get("postalCode") or "")
            loc["country"] = addr.get("addressCountry") or ""
            parts = [loc[k] for k in ("street", "city", "state", "postal_code", "country") if loc[k]]
            loc["address"] = ", ".join(parts)
    geo = schema.get("geo")
    if isinstance(geo, dict):
        lat, lon = geo.get("latitude"), geo.get("longitude")
        loc["latitude"] = "" if lat in (None, "") else str(lat)
        loc["longitude"] = "" if lon in (None, "") else str(lon)
    tel = schema.get("telephone")
    if tel:
        loc["phone"] = tel[0] if isinstance(tel, list) else tel
    em = schema.get("email")
    if em:
        loc["email"] = em[0] if isinstance(em, list) else em
    if loc["address"] or (loc["latitude"] and loc["longitude"]):
        return loc
    return None


def extract_jsonld(doc: Doc, url: str) -> list[dict]:
    out = []
    for node in doc.scripts(type_contains="application/ld+json"):
        try:
            data = json.loads(node.own_text())
        except (json.JSONDecodeError, TypeError):
            continue
        items = data.get("@graph") if isinstance(data, dict) and data.get("@graph") else [data]
        for item in items:
            if _is_location_schema(item):
                loc = _parse_schema_object(item, url)
                if loc:
                    out.append(loc)
    return out


# ---------------------------------------------------------------------------
# E2: Microdata (structured-data-extractor.service.js:166-265)
# ---------------------------------------------------------------------------

_MICRO_TYPES = ("LocalBusiness", "Organization", "Place", "PostalAddress")


def extract_microdata(doc: Doc, url: str) -> list[dict]:
    out = []
    for el in doc.itemtypes("schema.org"):
        itype = el.attr("itemtype") or ""
        if not any(t in itype for t in _MICRO_TYPES):
            continue
        g = lambda p: doc.itemprop_value(el, p)  # content attr preferred over text
        loc = {
            "name": g("name"), "street": g("streetAddress"), "city": g("addressLocality"),
            "state": g("addressRegion"), "postal_code": g("postalCode"),
            "country": g("addressCountry"), "latitude": g("latitude"), "longitude": g("longitude"),
            "phone": g("telephone"), "email": g("email"),
            "source_url": url, "extraction_method": "microdata", "confidence": 0.90,
        }
        parts = [loc[k] for k in ("street", "city", "state", "postal_code", "country") if loc[k]]
        loc["address"] = ", ".join(parts)
        if loc["address"] or (loc["latitude"] and loc["longitude"]):
            out.append(loc)
    return out


# ---------------------------------------------------------------------------
# E4/E5: Heuristic extractor (heuristic-extractor.service.js:11-307)
# ---------------------------------------------------------------------------

_SEMANTIC_CLASS_SUBSTR = ("address", "contact", "office", "location")
_SEMANTIC_ID_SUBSTR = ("address", "contact", "location")
_SEMANTIC_CLASS_EXACT = ("contact-info", "office-location", "location-list",
                         "locations", "office-details", "branch-info")

_HEADING_RE = re.compile(
    r"contact|location|office|offices|find|our locations|addresses|headquarters|visit|reach|where", re.I)

_ADDR_PATTERNS = (
    re.compile(r"\d{1,5}\s+\w+\s+(Street|St|Avenue|Ave|Road|Rd|Drive|Dr|Lane|Ln|Boulevard|Blvd|Way|Court|Ct|Place|Pl|Square|Sq|Parkway|Pkwy)", re.I),
    re.compile(r"\b(Suite|Ste|Floor|Fl|Building|Bldg|Unit|Apt|#)\s*\d+", re.I),
    re.compile(r"P\.?O\.?\s*Box\s+\d+", re.I),
    re.compile(r"\d{1,5}\s+[\w\s,]+\d{5}(-\d{4})?"),
)

_ADDR_INDICATORS = (
    re.compile(r"\b(Street|St|Avenue|Ave|Road|Rd|Drive|Dr|Lane|Ln|Boulevard|Blvd|Way|Court|Ct|Place|Pl|Square|Sq|Parkway|Pkwy)\b", re.I),
    re.compile(r"\b(Suite|Ste|Floor|Fl|Building|Bldg|Unit|Apt|#)\s*\d+", re.I),
    re.compile(r"\b\d{5}(-\d{4})?\b"),
    re.compile(r"\b[A-Z]\d[A-Z]\s*\d[A-Z]\d\b"),
    re.compile(r"\b[A-Z]{1,2}\d{1,2}\s*\d[A-Z]{2}\b"),
    re.compile(r"P\.?O\.?\s*Box\s+\d+", re.I),
    re.compile(r"\b(city|town|village|state|province|county|zip|postal|code)\b", re.I),
)

_MULTISPACE_RE = re.compile(r"\s{2,}")
_DIGIT_RE = re.compile(r"\d")
_LIST_CTX = ("office", "location", "address", "contact")


def looks_like_address(text: str) -> bool:
    """heuristic-extractor.service.js:189-215."""
    return (any(rx.search(text) for rx in _ADDR_INDICATORS)
            and _DIGIT_RE.search(text) is not None
            and 20 <= len(text) <= 400)


def _clean(text: str) -> str:
    return _MULTISPACE_RE.sub(" ", text.strip())


def _heur_semantic(doc: Doc) -> list[dict]:
    """:42-75 — every selector match is pushed (duplicates dedup'd at :222)."""
    out = []
    for node in doc.root.iter_desc():
        cls, nid = node.classes, node.attr("id") or ""
        n_hits = 0
        if node.tag == "address":
            n_hits += 1
        n_hits += sum(1 for s in _SEMANTIC_CLASS_SUBSTR if s in cls)
        n_hits += sum(1 for s in _SEMANTIC_ID_SUBSTR if s in nid)
        toks = cls.split()
        n_hits += sum(1 for s in _SEMANTIC_CLASS_EXACT if s in toks)
        if n_hits:
            text = _clean(node.text())
            if text and 10 < len(text) < 500:
                out.extend({"name": "", "street": text, "confidence": 0.7}
                           for _ in range(n_hits))
    return out


def _heur_headings(doc: Doc) -> list[dict]:
    """:80-113."""
    out = []
    for h in doc.by_tag("h1", "h2", "h3", "h4", "h5", "h6"):
        ht = h.text().strip().lower()
        if not _HEADING_RE.search(ht):
            continue
        for depth, sib in enumerate(h.next_siblings()):
            if depth >= 8:
                break
            text = _clean(sib.text())
            if text and 15 < len(text) < 500 and looks_like_address(text):
                out.append({"name": ht, "street": text, "confidence": 0.8})
    return out


def _heur_text_patterns(doc: Doc) -> list[dict]:
    """:118-151."""
    out = []
    lines = [ln.strip() for ln in doc.body_text().split("\n")]
    lines = [ln for ln in lines if ln]
    for line in lines[:1000]:
        if len(line) < 20 or len(line) > 300:
            continue
        # every _ADDR_PATTERNS family requires a digit (and looksLikeAddress
        # gates on one): a digit-free line can never match — cheap pre-gate
        if _DIGIT_RE.search(line) is None:
            continue
        if any(rx.search(line) for rx in _ADDR_PATTERNS) and looks_like_address(line):
            out.append({"name": "", "street": re.sub(r"\s+", " ", line), "confidence": 0.6})
    return out


def _heur_lists(doc: Doc) -> list[dict]:
    """:156-182."""
    out = []
    for lst in doc.by_tag("ul", "ol", "dl"):
        ctx = lst.text().lower()
        if not any(k in ctx for k in _LIST_CTX):
            continue
        for item in lst.by_tag("li", "dd"):
            text = _clean(item.text())
            if text and 15 < len(text) < 400 and looks_like_address(text):
                out.append({"name": "", "street": text, "confidence": 0.75})
    return out


def dedup_heuristic(addresses: list[dict]) -> list[dict]:
    """:222-240 — first-seen on 100-char lowercased alnum key, key len > 10."""
    seen, unique = set(), []
    for addr in addresses:
        key = re.sub(r"[^\w\s]", "", re.sub(r"\s+", " ", (addr.get("street") or "").lower()))[:100]
        if key not in seen and len(key) > 10:
            seen.add(key)
            unique.append(addr)
    return unique


def extract_heuristic(doc: Doc, url: str) -> list[dict]:
    rows = _heur_semantic(doc) + _heur_headings(doc) + _heur_text_patterns(doc) + _heur_lists(doc)
    out = []
    for r in dedup_heuristic(rows):
        out.append({
            "name": r["name"], "address": r["street"], "street": r["street"],
            "city": "", "state": "", "postal_code": "", "country": "",
            "latitude": "", "longitude": "", "phone": "", "email": "",
            "source_url": url, "extraction_method": "heuristic",
            "confidence": float(r["confidence"]),
        })
    return out


_PHONE_RES = (
    re.compile(r"\b1?[-.\s]?\(?(\d{3})\)?[-.\s]?(\d{3})[-.\s]?(\d{4})\b"),
    re.compile(r"\+\d{1,3}[-.\s]?\(?\d{1,4}\)?[-.\s]?\d{1,4}[-.\s]?\d{1,9}"),
    re.compile(r"tel:[\+\d\s\-\(\)]+", re.I),
)
_EMAIL_RE = re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b")


def extract_phones(doc: Doc) -> list[str]:
    """E5 (:247-277) — insertion-ordered set semantics."""
    phones: dict[str, None] = {}
    body = doc.body_text()
    for rx in _PHONE_RES:
        for m in rx.finditer(body):
            phones.setdefault(m.group(0).strip())
    for a in doc.by_tag("a"):
        href = a.attr("href") or ""
        if href.startswith("tel:"):
            phones.setdefault(href[4:].strip())
    return list(phones)


def extract_emails(doc: Doc) -> list[str]:
    """E5 (:284-307)."""
    emails: dict[str, None] = {}
    for m in _EMAIL_RE.finditer(doc.body_text()):
        emails.setdefault(m.group(0).lower())
    for a in doc.by_tag("a"):
        href = a.attr("href") or ""
        if href.startswith("mailto:"):
            emails.setdefault(href[7:].split("?")[0].strip().lower())
    return list(emails)


# ---------------------------------------------------------------------------
# E8: Map detector (map-detector.service.js:11-175; caller crawler.service.js:349-380)
# ---------------------------------------------------------------------------

_MAP_PROVIDERS = ("google.com/maps", "bing.com/maps", "openstreetmap",
                  "mapbox", "maps.app.goo.gl", "leafletjs")
_AT_RE = re.compile(r"@(-?\d+\.\d+),\s*(-?\d+\.\d+)")
_3D4D_RE = re.compile(r"!3d(-?\d+\.\d+)!4d(-?\d+\.\d+)")
_PAIR_RE = re.compile(r"(-?\d+\.\d+),\s*(-?\d+\.\d+)")


def _coords_from_map_url(u: str):
    """6 URL shapes (map-detector:69-129)."""
    try:
        parts = urlsplit(u)
    except ValueError:
        return None
    full = parts.path + ("?" + parts.query if parts.query else "") + \
        ("#" + parts.fragment if parts.fragment else "")
    m = _AT_RE.search(full) or _3D4D_RE.search(full)
    if m:
        return float(m.group(1)), float(m.group(2))
    q = parse_qs(parts.query)
    if "q" in q:
        m = _PAIR_RE.search(q["q"][0])
        if m:
            return float(m.group(1)), float(m.group(2))
    if "center" in q:
        c = q["center"][0].split(",")
        if len(c) == 2:
            try:
                return float(c[0]), float(c[1])
            except ValueError:
                return None
    if "lat" in q and ("lon" in q or "lng" in q):
        try:
            return float(q["lat"][0]), float((q.get("lon") or q["lng"])[0])
        except ValueError:
            return None
    if "mlat" in q and "mlon" in q:
        try:
            return float(q["mlat"][0]), float(q["mlon"][0])
        except ValueError:
            return None
    return None


def _js_num_str(x: float) -> str:
    """JS Number.toString(): integral floats print without '.0'."""
    return str(int(x)) if float(x).is_integer() else repr(float(x))


def extract_map_coords(doc: Doc, url: str) -> list[dict]:
    out = []
    for f in doc.by_tag("iframe"):
        src = f.attr("src") or ""
        if src and any(p in src.lower() for p in _MAP_PROVIDERS):
            c = _coords_from_map_url(src)
            if c:
                out.append(("map-iframe", c))
    for a in doc.by_tag("a"):
        href = a.attr("href") or ""
        low = href.lower()
        if ("maps" in low or "directions" in low) and \
                ("google.com/maps" in low or "maps.app.goo.gl" in low):
            c = _coords_from_map_url(href)
            if c:
                out.append(("map-iframe", c))  # caller tags both iframe+link as map-iframe
    # data attributes (map-detector:136-175); caller method 'data-attribute'
    for el in doc.root.iter_desc():
        lat = el.attr("data-lat") or el.attr("data-latitude")
        lon = el.attr("data-lon") or el.attr("data-lng") or el.attr("data-longitude")
        if lat and lon:
            try:
                out.append(("data-attribute", (float(lat), float(lon))))
            except ValueError:
                pass
        dl = el.attr("data-location")
        if dl:
            try:
                p = json.loads(dl)
                if isinstance(p, dict) and p.get("lat") and p.get("lon"):
                    out.append(("data-attribute", (float(p["lat"]), float(p["lon"]))))
            except (json.JSONDecodeError, TypeError, ValueError):
                m = _PAIR_RE.search(dl)
                if m:
                    out.append(("data-attribute", (float(m.group(1)), float(m.group(2)))))
    rows = []
    for method, (lat, lon) in out:
        rows.append({
            "name": "", "address": "", "street": "", "city": "", "state": "",
            "postal_code": "", "country": "",
            "latitude": _js_num_str(lat), "longitude": _js_num_str(lon),
            "phone": "", "email": "",
            "source_url": url, "extraction_method": method, "confidence": 0.90,
        })
    return rows


# ---------------------------------------------------------------------------
# E9/E10: XHR JSON miner + needs-JS predicate (playwright-renderer:220-335)
# ---------------------------------------------------------------------------

def _alias(obj: dict, *keys):
    for k in keys:
        v = obj.get(k)
        if v:
            return v
    return ""


def mine_xhr_json(data, source_url: str) -> list[dict]:
    """Recursive scan, depth ≤ 15 (playwright-renderer:220-317)."""
    locations: list[dict] = []

    def scan(obj, depth=0):
        if depth > 15 or not isinstance(obj, (dict, list)):
            return
        if isinstance(obj, list):
            for it in obj:
                scan(it, depth + 1)
            return
        has_coords = bool(
            (obj.get("lat") and obj.get("lon")) or (obj.get("latitude") and obj.get("longitude"))
            or (obj.get("lat") and obj.get("lng")) or (obj.get("Latitude") and obj.get("Longitude"))
            or isinstance(obj.get("coordinates"), dict)
            or (isinstance(obj.get("location"), dict)
                and obj["location"].get("lat") and obj["location"].get("lon")))
        has_address = bool(_alias(obj, "address", "street", "city", "postalCode", "postal_code",
                                  "zip", "Address", "City", "State", "Country", "addressLine1",
                                  "street1", "streetAddress", "location_address", "full_address"))
        has_office = bool(_alias(obj, "office", "officeName", "office_name", "location",
                                 "locationName", "location_name", "siteName", "site_name", "branch")
                          or obj.get("type") in ("office", "location"))
        if has_coords or has_address or has_office:
            lat = obj.get("lat") or obj.get("latitude") or obj.get("Latitude") or None
            lon = obj.get("lon") or obj.get("lng") or obj.get("longitude") or obj.get("Longitude") or None
            c = obj.get("coordinates")
            if isinstance(c, dict):
                lat = c.get("lat") or c.get("latitude") or lat
                lon = c.get("lon") or c.get("lng") or c.get("longitude") or lon
            locd = obj.get("location")
            if isinstance(locd, dict):
                lat = locd.get("lat") or locd.get("latitude") or lat
                lon = locd.get("lon") or locd.get("lng") or locd.get("longitude") or lon
            name = _alias(obj, "name", "title", "location_name", "locationName",
                          "office_name", "officeName", "siteName", "site_name", "branch", "label")
            locations.append({
                "name": name if isinstance(name, str) else "",
                "street": _alias(obj, "address", "street", "street_address", "streetAddress",
                                 "addressLine1", "address_line1", "street1", "Address", "full_address"),
                "city": _alias(obj, "city", "City", "locality", "town"),
                "state": _alias(obj, "state", "State", "region", "province",
                                "state_province", "stateProvince"),
                "postal_code": str(_alias(obj, "postalCode", "postal_code", "zip",
                                          "postcode", "zipcode", "PostalCode")),
                "country": _alias(obj, "country", "Country", "country_code", "countryCode", "nation"),
                "phone": _alias(obj, "phone", "telephone", "phone_number", "phoneNumber", "tel", "Phone"),
                "email": _alias(obj, "email", "Email", "emailAddress"),
                "latitude": "" if lat in (None, "") else _js_num_str(float(lat)),
                "longitude": "" if lon in (None, "") else _js_num_str(float(lon)),
                "source_url": source_url, "extraction_method": "playwright-xhr",
                "confidence": 0.85,
            })
        for v in obj.values():
            if isinstance(v, (dict, list)):
                scan(v, depth + 1)

    scan(data)
    for loc in locations:
        street = loc.pop("street")
        loc["street"] = street if isinstance(street, str) else ""
        loc["address"] = loc["street"]
    return locations


def extract_xhr(xhr_json: str | None, url: str) -> list[dict]:
    if not xhr_json:
        return []
    try:
        data = json.loads(xhr_json)
    except json.JSONDecodeError:
        return []
    return mine_xhr_json(data, url)


def needs_js_rendering(html: str, doc: Doc) -> bool:
    """E10 (playwright-renderer:324-335)."""
    has_fw = ("react" in html or "React" in html or "vue" in html or "Vue" in html
              or "angular" in html or "ng-" in html)
    body = doc.body
    n_children = sum(1 for c in body.children if isinstance(c, Node))
    return has_fw or n_children < 3 or len(doc.body_text().strip()) < 200


# ---------------------------------------------------------------------------
# Inline-script location mining (location-extractor.service.js:561-650 subset:
# `var locations = [...]` arrays), tagged by caller at conf 0.80.
# ---------------------------------------------------------------------------

_VAR_LOC_RE = re.compile(r"(?:var|let|const)\s+locations\s*=\s*(\[.*?\])\s*;", re.S)


def extract_inline_script(doc: Doc, url: str) -> list[dict]:
    out = []
    for s in doc.scripts():
        if "application/ld+json" in (s.attr("type") or ""):
            continue
        txt = s.own_text()
        if len(txt) > 50_000 or "locations" not in txt:
            continue
        m = _VAR_LOC_RE.search(txt)
        if not m:
            continue
        try:
            arr = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue
        for loc in mine_xhr_json(arr, url):
            loc["extraction_method"] = "inline-script"
            loc["confidence"] = 0.80
            out.append(loc)
    return out


# ---------------------------------------------------------------------------
# Span assembly — the BASELINE input_hint invariant surface
# ---------------------------------------------------------------------------

_MEDIA_TAGS = frozenset({"img", "iframe", "video", "audio", "embed"})


def assemble_spans(doc: Doc) -> list[dict]:
    """Interleaved text+media spans in document order.

    Spec (shared with the synthetic generator's ground truth):
    walk the body; accumulate text nodes (script/style excluded); each
    media element with ``src`` flushes the accumulated text as one
    normalized text span, then emits a media span. ``offset`` advances
    by len(text) per text span and 1 per media span — strictly
    increasing within a row.
    """
    spans: list[dict] = []
    buf: list[str] = []
    offset = 0

    def flush():
        nonlocal offset
        t = " ".join(" ".join(buf).split())
        if t:
            spans.append({"kind": "text", "text": t, "media_ref": "", "offset": offset})
            offset += len(t)
        buf.clear()

    stack = [iter(doc.body.children)]
    while stack:
        try:
            c = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if isinstance(c, str):
            buf.append(c)
        elif c.tag in ("script", "style"):
            continue
        elif c.tag in _MEDIA_TAGS:
            src = c.attr("src")
            if src:
                flush()
                spans.append({"kind": "media", "text": "", "media_ref": src, "offset": offset})
                offset += 1
            else:
                stack.append(iter(c.children))
        else:
            stack.append(iter(c.children))
    flush()
    return spans


# ---------------------------------------------------------------------------
# F1: link extraction (regex fast path; document order, in-page first-seen dedup)
# ---------------------------------------------------------------------------

_HREF_RE = re.compile(r"<a\s[^>]*?href\s*=\s*\"([^\"]*)\"", re.I)


def extract_hrefs(html: str) -> list[str]:
    """Raw hrefs in document order (site-crawler.service.js:14-18 drops
    javascript:/mailto:/tel: downstream in canonicalize)."""
    return _HREF_RE.findall(html)


# ---------------------------------------------------------------------------
# The fused Ray stage
# ---------------------------------------------------------------------------

LOCATIONS_RAW_FIELDS = (
    "source_url", "name", "address", "street", "city", "state", "postal_code",
    "country", "latitude", "longitude", "phone", "email", "activity",
    "extraction_method", "confidence",
)


class ExtractStage:
    """map_batches actor stage: pages -> exploded locations_raw rows.

    Carries (depth, discovery_seq) provenance so order-sensitive dedup
    downstream can replay global scan order. One DOM parse per page is
    shared by all extractors; html is dropped on output (SURVEY §7.4.6).
    """

    def __init__(self, methods: tuple[str, ...] = ("structured", "composite",
                                                   "heuristic", "advanced",
                                                   "map", "xhr", "inline")):
        self.methods = frozenset(methods)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        xhrs = batch.column("xhr_json").to_pylist() if "xhr_json" in batch.column_names else [None] * len(urls)
        seqs = batch.column("discovery_seq").to_pylist() if "discovery_seq" in batch.column_names else [0] * len(urls)
        ptypes = batch.column("page_type").to_pylist() if "page_type" in batch.column_names else [""] * len(urls)
        ctypes = batch.column("content_type").to_pylist() if "content_type" in batch.column_names else [""] * len(urls)
        rows: list[dict] = []
        for url, html, xhr, seq, ptype, ctype in zip(urls, htmls, xhrs, seqs,
                                                     ptypes, ctypes):
            from ..functions.urltools import is_pdf_url
            if (ctype == "application/pdf" or is_pdf_url(url)) and html:
                # P3 routing: PDF payloads carry extracted text (the
                # pdf-parse step runs in the fetch pool; sandbox page store
                # ships text directly) -> E11 extractor
                from .extract_pdf import extract_pdf_locations
                page_locs = extract_pdf_locations(html, url)
            elif not html:
                page_locs = []
                if "xhr" in self.methods and xhr:
                    page_locs = extract_xhr(xhr, url)
            else:
                doc = parse(html)
                page_locs = []
                n_structured = 0
                if "structured" in self.methods:
                    page_locs += extract_jsonld(doc, url)
                    page_locs += extract_microdata(doc, url)
                    n_structured = len(page_locs)  # the reference's `locations1`
                if "composite" in self.methods:
                    from .extract_composite import extract_composite
                    page_locs += extract_composite(doc, url)
                if "inline" in self.methods:
                    page_locs += extract_inline_script(doc, url)
                if "heuristic" in self.methods:
                    page_locs += extract_heuristic(doc, url)
                if "advanced" in self.methods:
                    from .extract_advanced import advanced_location_rows
                    page_locs += advanced_location_rows(doc, html, url)
                if "universal" in self.methods:
                    # E7: not in the default chain (unreachable from any route
                    # in the reference); opt-in via methods=(... ,"universal")
                    from .extract_universal import extract_universal
                    page_locs += extract_universal(doc, url)
                if "map" in self.methods:
                    page_locs += extract_map_coords(doc, url)
                # crawler.service.js:383-398: Playwright-XHR runs when the
                # page needs JS, OR the STRUCTURED pass found nothing
                # (locations1), OR it's a location page (classified type or
                # url substring)
                is_location_page = (ptype == "locations"
                                    or "location" in url or "office" in url)
                if "xhr" in self.methods and xhr and (needs_js_rendering(html, doc)
                                                      or n_structured == 0
                                                      or is_location_page):
                    page_locs += extract_xhr(xhr, url)
            for j, loc in enumerate(page_locs):
                loc.setdefault("activity", "")
                loc["discovery_seq"] = seq
                loc["within_page_idx"] = j
                rows.append(loc)
        return _locs_to_table(rows)


def _locs_to_table(rows: list[dict]) -> pa.Table:
    cols: dict[str, list] = {f: [] for f in LOCATIONS_RAW_FIELDS}
    cols["discovery_seq"] = []
    cols["within_page_idx"] = []
    for r in rows:
        for f in LOCATIONS_RAW_FIELDS:
            cols[f].append(r.get(f, "") if f != "confidence" else r.get(f, 0.0))
        cols["discovery_seq"].append(r["discovery_seq"])
        cols["within_page_idx"].append(r["within_page_idx"])
    schema = pa.schema(
        [(f, pa.string()) for f in LOCATIONS_RAW_FIELDS if f != "confidence"]
        + [("confidence", pa.float32()), ("discovery_seq", pa.int64()),
           ("within_page_idx", pa.int32())]
    )
    arrays = []
    for fld in schema:
        vals = cols[fld.name]
        if fld.name not in ("confidence", "discovery_seq", "within_page_idx"):
            vals = ["" if v is None else str(v) for v in vals]
        arrays.append(pa.array(vals, type=fld.type))
    return pa.Table.from_arrays(arrays, schema=schema)


class SpanAssemblyStage:
    """map_batches stage: pages -> (doc_id, spans) interleaved documents."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        spans = [assemble_spans(parse(h)) if h else [] for h in htmls]
        span_t = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                                     ("media_ref", pa.string()), ("offset", pa.int32())]))
        return pa.table({"doc_id": pa.array(urls, pa.string()),
                         "spans": pa.array(spans, span_t)})


_WKT_PAIR_RE = re.compile(r"(-?\d+)\s+(-?\d+)")


def wkt_polygon_area_batch(t: pa.Table, wkt_col: str = "wkt",
                           id_col: str = "poly_id") -> pa.Table:
    """Parse WKT POLYGON strings (the reference's footprint payload
    shape, crawler.service.js building footprints) and compute the
    EXACT doubled signed shoelace area over integer vertices:
    2A = Σ (x_j · y_{j+1} − x_{j+1} · y_j) around the closed ring —
    all integers, no trig, no floats. Returns
    (poly_id, n_vertices, area2); n_vertices excludes the closing
    repeat vertex."""
    ids, nv, a2 = [], [], []
    for pid, wkt in zip(t.column(id_col).to_pylist(),
                        t.column(wkt_col).to_pylist()):
        pts = [(int(x), int(y))
               for x, y in _WKT_PAIR_RE.findall(wkt or "")]
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts = pts[:-1]
        acc = 0
        n = len(pts)
        for j in range(n):
            x1, y1 = pts[j]
            x2, y2 = pts[(j + 1) % n]
            acc += x1 * y2 - x2 * y1
        ids.append(pid)
        nv.append(n)
        a2.append(acc)
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "n_vertices": pa.array(nv, pa.int64()),
                     "area2": pa.array(a2, pa.int64())})


def point_in_polygons_batch(t: pa.Table, polys: list,
                            id_col: str = "pt_id") -> pa.Table:
    """EXACT integer ray-casting point-in-polygon test against a
    broadcast polygon list (the reference's map/geo core works over
    exactly this footprint-contains-point relation). ``polys`` is a
    list of (poly_id, [(x, y), ...]) integer rings. A horizontal
    ray to +inf crosses edge (p1, p2) iff (y1 > py) != (y2 > py) and
    px · dy [<|>] x1 · dy + (x2 − x1)(py − y1) with the comparison
    flipped when dy < 0 — cross-multiplied, NO division, so the
    odd-crossings parity is bit-exact vs SQL. Emits one row per
    (point, containing polygon)."""
    px = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
    py = t.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
    ids = t.column(id_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    out_p, out_g = [], []
    for pid, ring in polys:
        cross = np.zeros(len(px), np.int64)
        n = len(ring)
        for j in range(n):
            x1, y1 = ring[j]
            x2, y2 = ring[(j + 1) % n]
            straddle = (y1 > py) != (y2 > py)
            if not straddle.any():
                continue
            dy = y2 - y1
            lhs = px * dy
            rhs = x1 * dy + (x2 - x1) * (py - y1)
            hit = straddle & ((lhs < rhs) if dy > 0 else (lhs > rhs))
            cross += hit
        inside = (cross % 2) == 1
        out_p.extend(ids[inside].tolist())
        out_g.extend([pid] * int(inside.sum()))
    return pa.table({id_col: pa.array(out_p, pa.int64()),
                     "poly_id": pa.array(out_g, pa.int64())})
