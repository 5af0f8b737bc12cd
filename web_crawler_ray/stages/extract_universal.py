"""E7: Universal location extractor v3 (universal-location-extractor.service.js).

Seven strategies transcribed (:55-417): card layouts with country/region
header context, recursive JSON-LD, keyword-gated lists, all-table-rows,
sections with length gate [50,1000], grid/flex children, whole-DOM
generic scan; component finders (:22-49, 440-506): 3 street patterns, 4
postal patterns, state/province tables, 41-country list, known-city
list; dedup key ``street|city|postal`` lowercased (:569-583).

Only reachable in the reference via the professional-crawler path (not
wired to a route); exposed here as an independent registry stage with
``extraction_method='universal'``, confidence 0.80 (documented choice —
the unreachable caller assigns none).
"""

from __future__ import annotations

import re

from ..functions.domlite import Doc, Node

STREET_PATTERNS = (
    re.compile(r"\d+\s+[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*\s+(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Drive|Dr|Way|Lane|Ln|Court|Ct|Place|Pl|Plaza|Parkway|Pkwy|Circle|Cir|Terrace|Ter|Trail|Square|Suite|Floor|Level)\b", re.I),
    re.compile(r"(?:Level|Suite|Floor|Unit)\s+\d+", re.I),
    re.compile(r"\d+[-\s]\d+\s+[A-Z][a-z]+\s+(?:Street|Road|Avenue)", re.I),
)

POSTAL_PATTERNS = (
    re.compile(r"\b\d{5}(?:-\d{4})?\b"),
    re.compile(r"\b[A-Z]\d[A-Z]\s?\d[A-Z]\d\b"),
    re.compile(r"\b[A-Z]{1,2}\d{1,2}\s?\d[A-Z]{2}\b"),
    re.compile(r"\b\d{4}\b(?!\s*(?:Street|St|Avenue|Ave|Road|Rd))"),
)

STATE_PATTERNS = (
    re.compile(r"\b(AL|AK|AZ|AR|CA|CO|CT|DE|FL|GA|HI|ID|IL|IN|IA|KS|KY|LA|ME|MD|MA|MI|MN|MS|MO|MT|NE|NV|NH|NJ|NM|NY|NC|ND|OH|OK|OR|PA|RI|SC|SD|TN|TX|UT|VT|VA|WA|WV|WI|WY|QLD|NSW|VIC|ACT|SA|WA|TAS|NT|ON|BC|AB|MB|SK|NS|NB|PE|NL|YT|NT|NU)\b"),
    re.compile(r"\b(Queensland|New South Wales|Victoria|Australian Capital Territory|South Australia|Western Australia|Tasmania|Northern Territory)\b", re.I),
    re.compile(r"\b(Ontario|British Columbia|Alberta|Manitoba|Saskatchewan|Nova Scotia|New Brunswick)\b", re.I),
)

COUNTRIES = (
    "United States", "USA", "US", "United Kingdom", "UK", "Canada", "Australia",
    "Germany", "France", "India", "China", "Japan", "Singapore", "Brazil",
    "Mexico", "Italy", "Spain", "Netherlands", "Switzerland", "Sweden", "Norway",
    "Denmark", "Finland", "Ireland", "Belgium", "Austria", "Poland", "Russia",
    "South Korea", "Taiwan", "Hong Kong", "Thailand", "Malaysia", "Indonesia",
    "Philippines", "Vietnam", "UAE", "Saudi Arabia", "Israel", "Egypt", "South Africa",
)

KNOWN_CITIES = (
    "New York", "Los Angeles", "Chicago", "Houston", "Phoenix", "Philadelphia",
    "San Antonio", "San Diego", "Dallas", "San Jose", "Austin", "San Francisco",
    "Seattle", "Denver", "Washington", "Boston", "Portland", "Las Vegas",
    "Miami", "Atlanta", "London", "Paris", "Berlin", "Tokyo", "Singapore",
    "Sydney", "Melbourne", "Brisbane", "Canberra", "Perth", "Adelaide",
    "Mumbai", "Bangalore", "Delhi", "Hyderabad", "Chennai", "Kolkata", "Pune",
)

_CITY_RE = re.compile(r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\s*,\s*([A-Z]{2,3}|\d{5})")
_PHONE_RES = (
    re.compile(r"(?:\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}"),
    re.compile(r"\+\d{1,3}[-.\s]?\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{1,9}"),
    re.compile(r"\d{3}[-.\s]\d{3}[-.\s]\d{4}"),
)
_EMAIL_RE = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}")
_NUM_CAP_RE = re.compile(r"\d+\s+[A-Z]")


def _first(patterns, text: str) -> str:
    for rx in patterns:
        m = rx.search(text)
        if m:
            return m.group(0).strip()
    return ""


def find_street(text: str) -> str:
    return _first(STREET_PATTERNS, text)


def find_postal(text: str) -> str:
    return _first(POSTAL_PATTERNS, text)


def find_state(text: str) -> str:
    return _first(STATE_PATTERNS, text)


def find_city(text: str) -> str:
    m = _CITY_RE.search(text)
    if m:
        return m.group(1).strip()
    for c in KNOWN_CITIES:
        if c in text:
            return c
    return ""


def extract_country_name(text: str) -> str:
    up = text.upper()
    for c in COUNTRIES:
        if c.upper() in up:
            return c
    return ""


def contains_address_components(text: str) -> bool:
    return (any(rx.search(text) for rx in STREET_PATTERNS)
            or any(rx.search(text) for rx in POSTAL_PATTERNS)
            or _NUM_CAP_RE.search(text) is not None)


def parse_address_text(text: str, source_url: str, source_type: str) -> dict | None:
    """:440-470 — lenient: any single component qualifies."""
    street = find_street(text)
    city = find_city(text)
    state = find_state(text)
    postal = find_postal(text)
    country = extract_country_name(text)
    if not (street or postal or city or country or state):
        return None
    return {"name": city or country or "Office", "street": street, "city": city,
            "state": state, "postal_code": postal, "country": country,
            "phone": _first(_PHONE_RES, text), "email": _first([_EMAIL_RE], text),
            "source_type": source_type}


def _is_card(n: Node) -> bool:
    toks = n.classes.split()
    return (n.tag == "article"
            or any(t in toks for t in ("card", "location-card", "office-card",
                                       "address-card", "item", "box", "panel"))
            or any(s in n.classes for s in ("card", "location", "office")))


def extract_cards(doc: Doc, url: str) -> list[dict]:
    """:113-205 — country/region header context + card scan."""
    current_country = ""
    current_region = ""
    for h in doc.root.find_all(
            lambda n: n.tag in ("h1", "h2", "h3", "h4", "h5", "h6", "strong", "b")
            or "country" in n.classes or "region" in n.classes):
        ht = h.text().strip().upper()
        if any(c.upper() in ht for c in COUNTRIES):
            current_country = extract_country_name(ht)
        if any(rx.search(ht) for rx in STATE_PATTERNS):
            current_region = ht
    out = []
    for card in doc.root.find_all(_is_card):
        text = card.text()
        if len(text) < 30:
            continue
        city = ""
        for n in card.iter_desc():
            if n.tag in ("h1", "h2", "h3", "h4", "h5", "h6", "strong", "b") \
                    or "city" in n.classes or "title" in n.classes:
                city = n.text().strip()
                break
        street = find_street(text)
        postal = find_postal(text)
        state = find_state(text)
        country = current_country or extract_country_name(text)
        if (street or postal or state) and (city or country):
            out.append({"name": city or f"{country} Office", "street": street,
                        "city": city, "state": state or current_region,
                        "postal_code": postal, "country": country,
                        "phone": _first(_PHONE_RES, text),
                        "email": _first([_EMAIL_RE], text),
                        "source_type": "card-extraction"})
    return out


def extract_jsonld_recursive(doc: Doc, url: str) -> list[dict]:
    """:208-269 — recursive, EXACT-string @type containing Place/LocalBusiness/
    Organization, address object required."""
    import json
    out = []

    def rec(obj):
        if obj is None:
            return
        if isinstance(obj, list):
            for it in obj:
                rec(it)
            return
        if not isinstance(obj, dict):
            return
        if obj.get("@graph"):
            rec(obj["@graph"])
            return
        t = obj.get("@type")
        if isinstance(t, str) and ("Place" in t or "LocalBusiness" in t
                                   or "Organization" in t):
            addr = obj.get("address")
            if isinstance(addr, dict):
                geo = obj.get("geo") or {}
                out.append({
                    "name": obj.get("name") or obj.get("legalName") or "",
                    "street": addr.get("streetAddress") or "",
                    "city": addr.get("addressLocality") or "",
                    "state": addr.get("addressRegion") or "",
                    "postal_code": str(addr.get("postalCode") or ""),
                    "country": addr.get("addressCountry") or "",
                    "phone": obj.get("telephone") or obj.get("phone") or "",
                    "email": obj.get("email") or "",
                    "latitude": "" if geo.get("latitude") in (None, "") else str(geo["latitude"]),
                    "longitude": "" if geo.get("longitude") in (None, "") else str(geo["longitude"]),
                    "source_type": "json-ld"})
        for k, v in obj.items():
            if isinstance(v, (dict, list)) and k != "@context":
                rec(v)

    for s in doc.scripts(type_contains="application/ld+json"):
        try:
            rec(json.loads(s.own_text()))
        except json.JSONDecodeError:
            pass
    return out


def extract_lists(doc: Doc, url: str) -> list[dict]:
    """:274-300."""
    out = []
    for lst in doc.by_tag("ul", "ol"):
        low = lst.text().lower()
        if not any(k in low for k in ("office", "location", "address", "contact")):
            continue
        for li in lst.by_tag("li"):
            text = li.text()
            if len(text) < 30:
                continue
            loc = parse_address_text(text, url, "list")
            if loc:
                out.append(loc)
    return out


def extract_tables(doc: Doc, url: str) -> list[dict]:
    """:305-326 — every row of every table (no keyword gate here)."""
    out = []
    for table in doc.by_tag("table"):
        for row in table.by_tag("tr"):
            cells = [c.text().strip() for c in row.by_tag("td", "th")]
            row_text = " ".join(cells)
            if len(row_text) < 30:
                continue
            loc = parse_address_text(row_text, url, "table")
            if loc:
                out.append(loc)
    return out


def extract_sections(doc: Doc, url: str) -> list[dict]:
    """:331-357 — length window [50,1000]."""
    out = []
    for el in doc.root.find_all(lambda n: n.tag in ("section", "article", "div")):
        text = el.text()
        if len(text) < 50 or len(text) > 1000:
            continue
        if contains_address_components(text):
            loc = parse_address_text(text, url, "section")
            if loc:
                heads = el.by_tag("h1", "h2", "h3", "h4", "h5", "h6")
                if heads:
                    h = heads[0].text().strip()
                    if h:
                        loc["name"] = h
                out.append(loc)
    return out


def extract_grids(doc: Doc, url: str) -> list[dict]:
    """:362-387 — direct children of grid/flex/col containers."""
    out = []
    for el in doc.root.find_all(
            lambda n: any(s in n.classes for s in ("grid", "flex", "col"))
            or "display: grid" in (n.attr("style") or "")
            or "display: flex" in (n.attr("style") or "")):
        for child in el.children:
            if not isinstance(child, Node):
                continue
            text = child.text()
            if len(text) < 30 or len(text) > 800:
                continue
            if contains_address_components(text):
                loc = parse_address_text(text, url, "grid")
                if loc:
                    out.append(loc)
    return out


def extract_generic(doc: Doc, url: str) -> list[dict]:
    """:392-417 — whole-DOM scan, text-dedup, street-or-postal gate."""
    out = []
    processed: set[str] = set()
    for el in doc.root.iter_desc():
        text = el.text().strip()
        if len(text) < 50 or len(text) > 600 or text in processed:
            continue
        if any(rx.search(text) for rx in STREET_PATTERNS) or \
                any(rx.search(text) for rx in POSTAL_PATTERNS):
            loc = parse_address_text(text, url, "generic")
            if loc:
                out.append(loc)
                processed.add(text)
    return out


def extract_universal(doc: Doc, url: str) -> list[dict]:
    """All 7 strategies + dedup on street|city|postal (:569-583)."""
    rows = (extract_cards(doc, url) + extract_jsonld_recursive(doc, url)
            + extract_lists(doc, url) + extract_tables(doc, url)
            + extract_sections(doc, url) + extract_grids(doc, url)
            + extract_generic(doc, url))
    seen: set[str] = set()
    out = []
    for r in rows:
        key = f"{r.get('street', '')}|{r.get('city', '')}|{r.get('postal_code', '')}".lower()
        if key in seen:
            continue
        seen.add(key)
        addr = ", ".join(x for x in (r.get("street"), r.get("city"),
                                     r.get("state"), r.get("postal_code"),
                                     r.get("country")) if x)
        out.append({
            "name": r.get("name") or "", "address": addr,
            "street": r.get("street") or "", "city": r.get("city") or "",
            "state": r.get("state") or "", "postal_code": r.get("postal_code") or "",
            "country": r.get("country") or "",
            "latitude": r.get("latitude") or "", "longitude": r.get("longitude") or "",
            "phone": r.get("phone") or "", "email": r.get("email") or "",
            "source_url": url, "extraction_method": "universal",
            "confidence": 0.80,
        })
    return out
