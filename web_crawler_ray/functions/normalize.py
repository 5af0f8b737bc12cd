"""Normalizer / scalar-function library (SURVEY §2.4, N1-N12).

Semantics transcribed from the reference (constants are behavior):
- N1-N7: web-crawler-backend/src/services/address-normalizer.service.js
  (:96-257, tables :11-46)
- N8 iso2->iso3: src/services/geocoding.service.js:126-144
- N9 dedup-normalize variants: location-extractor.service.js:530-537,
  enhanced-deduplication.service.js:169-186, crawler.service.js:211-214
- N10 guessActivity: location-extractor.service.js:491-503
- N11 estimateHeight: crawler.service.js:491-506
- N12 createFootprint: crawler.service.js:508-540

JS quirks deliberately preserved (they are observable behavior):
- ``normalize_address`` builds ``\\b<entry>\\b`` regexes from the raw
  abbreviation-table keys, so dots in keys like ``st.`` act as regex
  wildcards, and entries are applied in table insertion order;
- the ``(\\d+)\\s*-\\s*(\\d+)`` tightening replaces only the FIRST
  occurrence (JS non-global replace).

These are scalar functions; batch stages apply them per Arrow batch
with compiled module-level regexes (no per-call compilation).
"""

from __future__ import annotations

import math
import re

# --- tables (address-normalizer.service.js:11-46) ---------------------------

COUNTRY_MAP = {
    "usa": "US", "united states": "US", "us": "US", "u.s.": "US", "u.s.a.": "US",
    "uk": "GB", "united kingdom": "GB", "great britain": "GB", "england": "GB",
    "australia": "AU", "aus": "AU",
    "canada": "CA", "can": "CA",
    "germany": "DE", "deutschland": "DE",
    "france": "FR",
    "spain": "ES", "españa": "ES",
    "italy": "IT", "italia": "IT",
    "netherlands": "NL", "holland": "NL",
    "switzerland": "CH", "schweiz": "CH",
    "india": "IN",
    "china": "CN",
    "japan": "JP",
    "singapore": "SG",
}

STREET_ABBR = {
    "street": "St", "st.": "St", "str": "St",
    "avenue": "Ave", "ave.": "Ave", "av": "Ave",
    "road": "Rd", "rd.": "Rd",
    "boulevard": "Blvd", "blvd.": "Blvd",
    "drive": "Dr", "dr.": "Dr",
    "lane": "Ln", "ln.": "Ln",
    "court": "Ct", "ct.": "Ct",
    "place": "Pl", "pl.": "Pl",
    "square": "Sq", "sq.": "Sq",
    "terrace": "Ter", "ter.": "Ter",
    "parkway": "Pkwy", "pkwy.": "Pkwy",
    "highway": "Hwy", "hwy.": "Hwy",
    "building": "Bldg", "bldg.": "Bldg",
    "suite": "Ste", "ste.": "Ste",
    "floor": "Fl", "fl.": "Fl", "flr": "Fl",
    "apartment": "Apt", "apt.": "Apt",
}
# compiled once, insertion order preserved (JS object iteration order)
_STREET_ABBR_RES = [(re.compile(rf"\b{k}\b", re.I), v) for k, v in STREET_ABBR.items()]

US_STATES = {
    "ALABAMA": "AL", "ALASKA": "AK", "ARIZONA": "AZ", "ARKANSAS": "AR",
    "CALIFORNIA": "CA", "COLORADO": "CO", "CONNECTICUT": "CT", "DELAWARE": "DE",
    "FLORIDA": "FL", "GEORGIA": "GA", "HAWAII": "HI", "IDAHO": "ID",
    "ILLINOIS": "IL", "INDIANA": "IN", "IOWA": "IA", "KANSAS": "KS",
    "KENTUCKY": "KY", "LOUISIANA": "LA", "MAINE": "ME", "MARYLAND": "MD",
    "MASSACHUSETTS": "MA", "MICHIGAN": "MI", "MINNESOTA": "MN", "MISSISSIPPI": "MS",
    "MISSOURI": "MO", "MONTANA": "MT", "NEBRASKA": "NE", "NEVADA": "NV",
    "NEW HAMPSHIRE": "NH", "NEW JERSEY": "NJ", "NEW MEXICO": "NM", "NEW YORK": "NY",
    "NORTH CAROLINA": "NC", "NORTH DAKOTA": "ND", "OHIO": "OH", "OKLAHOMA": "OK",
    "OREGON": "OR", "PENNSYLVANIA": "PA", "RHODE ISLAND": "RI", "SOUTH CAROLINA": "SC",
    "SOUTH DAKOTA": "SD", "TENNESSEE": "TN", "TEXAS": "TX", "UTAH": "UT",
    "VERMONT": "VT", "VIRGINIA": "VA", "WASHINGTON": "WA", "WEST VIRGINIA": "WV",
    "WISCONSIN": "WI", "WYOMING": "WY",
}

ISO2_TO_ISO3 = {
    "US": "USA", "GB": "GBR", "CA": "CAN", "AU": "AUS", "DE": "DEU",
    "FR": "FRA", "IT": "ITA", "ES": "ESP", "NL": "NLD", "BE": "BEL",
    "CH": "CHE", "AT": "AUT", "SE": "SWE", "NO": "NOR", "DK": "DNK",
    "FI": "FIN", "PL": "POL", "CZ": "CZE", "IE": "IRL", "PT": "PRT",
    "GR": "GRC", "HU": "HUN", "RO": "ROU", "BG": "BGR", "HR": "HRV",
    "SI": "SVN", "SK": "SVK", "LT": "LTU", "LV": "LVA", "EE": "EST",
    "IS": "ISL", "LU": "LUX", "MT": "MLT", "CY": "CYP", "JP": "JPN",
    "CN": "CHN", "IN": "IND", "KR": "KOR", "SG": "SGP", "MY": "MYS",
    "TH": "THA", "ID": "IDN", "PH": "PHL", "VN": "VNM", "NZ": "NZL",
    "MX": "MEX", "BR": "BRA", "AR": "ARG", "CL": "CHL", "CO": "COL",
    "PE": "PER", "VE": "VEN", "ZA": "ZAF", "NG": "NGA", "EG": "EGY",
    "KE": "KEN", "SA": "SAU", "AE": "ARE", "IL": "ISR", "TR": "TUR",
    "RU": "RUS", "UA": "UKR", "BY": "BLR", "KZ": "KAZ", "UZ": "UZB",
}

ACTIVITY_HEIGHTS = {
    "Headquarters": 45.0, "Office": 30.0, "Branch Office": 15.0, "Retail": 6.0,
    "Warehouse": 12.0, "Manufacturing": 15.0, "Data Center": 10.0, "Restaurant": 5.0,
}

_WS_RE = re.compile(r"\s+")
_NL_RE = re.compile(r"\n+")
_TRAIL_PUNCT_RE = re.compile(r"[,;]+$")
_NUM_DASH_RE = re.compile(r"(\d+)\s*-\s*(\d+)")
_NON_ALNUM_PIPE_RE = re.compile(r"[^a-z0-9|]")
_NON_DIGIT_RE = re.compile(r"[^\d]")
_US_ZIP_RE = re.compile(r"^\d{5}(\d{4})?$")
_CA_POST_RE = re.compile(r"^[A-Z]\d[A-Z]\d[A-Z]\d$")
_TWO_LETTER_RE = re.compile(r"^[a-z]{2}$", re.I)


def normalize_text(text: str | None) -> str:
    """N1: trim + collapse whitespace (address-normalizer:96-102)."""
    if not text:
        return ""
    return _NL_RE.sub(" ", _WS_RE.sub(" ", text.strip()))


def normalize_address(address: str | None) -> str:
    """N2 (address-normalizer:107-125)."""
    if not address:
        return ""
    s = normalize_text(address)
    for rx, abbr in _STREET_ABBR_RES:
        s = rx.sub(abbr, s)
    s = _TRAIL_PUNCT_RE.sub("", s)
    s = _NUM_DASH_RE.sub(r"\1-\2", s, count=1)  # JS non-global replace
    return s


def normalize_state(state: str | None) -> str:
    """N3 (address-normalizer:130-153)."""
    if not state:
        return ""
    up = state.strip().upper()
    return US_STATES.get(up, up)


def normalize_postal_code(code: str | None) -> str:
    """N4 (address-normalizer:158-175)."""
    if not code:
        return ""
    s = re.sub(r"[\s-]", "", str(code).upper())
    if _US_ZIP_RE.match(s):
        return f"{s[:5]}-{s[5:]}" if len(s) == 9 else s
    if _CA_POST_RE.match(s):
        return f"{s[:3]} {s[3:]}"
    return s


def normalize_country(country: str | None) -> str:
    """N5 (address-normalizer:180-192)."""
    if not country:
        return ""
    low = country.lower().strip()
    if _TWO_LETTER_RE.match(low):
        return low.upper()
    return COUNTRY_MAP.get(low, low.upper()).upper()


def normalize_phone(phone: str | None) -> str:
    """N6 (address-normalizer:197-221)."""
    if not phone:
        return ""
    s = str(phone).strip()
    has_plus = s.startswith("+")
    digits = _NON_DIGIT_RE.sub("", s)
    if has_plus:
        digits_out = "+" + digits
    else:
        digits_out = digits
    if not has_plus and len(digits) == 10:
        return f"({digits[:3]}) {digits[3:6]}-{digits[6:]}"
    # JS checks normalized.length === 11 on the possibly-plus-prefixed string
    if len(digits_out) == 11 and digits_out.startswith("1"):
        return f"+{digits_out[0]}-{digits_out[1:4]}-{digits_out[4:7]}-{digits_out[7:]}"
    return digits_out


def canonical_key(name: str | None, street: str | None, city: str | None,
                  postal: str | None, lat=None, lon=None) -> str | None:
    """N7: exact-dedup key (address-normalizer:235-257)."""
    parts = [p for p in (name, street, city, postal) if p]
    if not parts:
        if lat and lon:
            return f"coord_{lat}_{lon}"
        return None
    return _NON_ALNUM_PIPE_RE.sub("", "|".join(parts).lower())


def iso2_to_iso3(iso2: str) -> str:
    """N8 (geocoding.service.js:126-144)."""
    return ISO2_TO_ISO3.get(iso2, iso2)


# --- N9 dedup-normalize variants --------------------------------------------

_LE_PUNCT_RE = re.compile(r"[.,\-#]")
_LE_STREET_RE = re.compile(r"\b(street|st|avenue|ave|road|rd|boulevard|blvd|suite|ste|unit|apt)\b")
_ED_NONWORD_RE = re.compile(r"[^\w\s]")
_ED_STREET_RE = re.compile(r"\b(street|st|avenue|ave|road|rd|boulevard|blvd|drive|dr|lane|ln)\b")


def dedup_norm_location_extractor(address: str) -> str:
    """location-extractor.service.js:530-537 (gates D1)."""
    s = _LE_PUNCT_RE.sub(" ", address.lower())
    s = _WS_RE.sub(" ", s)
    s = _LE_STREET_RE.sub("", s)
    return s.strip()


def dedup_norm_enhanced(address: str) -> str:
    """enhanced-deduplication.service.js:169-186 (gates D3 address sim)."""
    s = _ED_NONWORD_RE.sub("", address.lower())
    s = _WS_RE.sub(" ", s)
    s = _ED_STREET_RE.sub("", s)
    return s.strip()


def dedup_norm_postcode(postcode: str) -> str:
    """enhanced-deduplication.service.js:181-186."""
    return re.sub(r"[^\w]", "", postcode.upper()).strip()


def squash_address(address: str) -> str:
    """crawler.service.js:211-214 (gates D4 cross-page dedup)."""
    return re.sub(r"[^\w]", "", address.lower())


# --- N10-N12 ----------------------------------------------------------------

_ACTIVITY_RULES = (
    (("headquarter", "hq"), "Headquarters"),
    (("retail", "store", "shop"), "Retail"),
    (("warehouse", "distribution", "fulfillment"), "Warehouse"),
    (("manufacturing", "factory", "plant"), "Manufacturing"),
    (("data center", "datacenter"), "Data Center"),
    (("restaurant", "cafe", "food"), "Restaurant"),
    (("branch", "regional"), "Branch Office"),
)


def guess_activity(text: str) -> str:
    """N10 (location-extractor:491-503)."""
    low = text.lower()
    for keys, label in _ACTIVITY_RULES:
        if any(k in low for k in keys):
            return label
    return "Office"


def estimate_height(activity: str | None) -> float:
    """N11 (crawler.service.js:491-506)."""
    return ACTIVITY_HEIGHTS.get(activity or "", 25.0)


def _fmt6(x: float) -> str:
    """JS Number.toFixed(6) — half-away-from-zero rounding."""
    return f"{math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1):.6f}"


def create_footprint(lat, lon) -> str | None:
    """N12: ±0.0001° square -> WKT MULTIPOLYGON (crawler.service.js:508-540)."""
    if lat is None or lon is None or lat == "" or lon == "":
        return None
    try:
        la, lo = float(lat), float(lon)
    except (TypeError, ValueError):
        return None
    if math.isnan(la) or math.isnan(lo):
        return None
    off = 0.0001
    corners = [
        (lo - off, la - off), (lo + off, la - off),
        (lo + off, la + off), (lo - off, la + off), (lo - off, la - off),
    ]
    coords = ", ".join(f"{_fmt6(x)} {_fmt6(y)}" for x, y in corners)
    return f"MULTIPOLYGON((({coords})))"


# --- string similarity / distance (enhanced-deduplication:191-246) ----------

def levenshtein_ratio(s1: str, s2: str) -> float:
    """1 - dist/max_len (enhanced-deduplication.service.js:191-225)."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    # classic two-row DP
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cost = 0 if c1 == c2 else 1
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost))
        prev = cur
    return 1.0 - prev[-1] / max(len(s1), len(s2))


def _levenshtein_dist_batch(ss1: list, ss2: list) -> "np.ndarray":
    """Edit distances for P string pairs at once: padded codepoint
    matrices + row-DP where the in-row (insertion) dependency is closed
    by the prefix-min identity cur[j] = min_{k<=j}(t[k] - k) + j, so
    every row is pure numpy over all pairs simultaneously. Distances are
    exactly the classic DP's (integers), hence ratios below are
    bit-identical to levenshtein_ratio."""
    import numpy as np
    P = len(ss1)
    la = np.array([len(s) for s in ss1], dtype=np.int64)
    lb = np.array([len(s) for s in ss2], dtype=np.int64)
    La, Lb = int(la.max()), int(lb.max())
    A = np.zeros((P, max(La, 1)), dtype=np.uint32)
    B = np.zeros((P, max(Lb, 1)), dtype=np.uint32)
    for p, s in enumerate(ss1):
        if s:
            A[p, :len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    for p, s in enumerate(ss2):
        if s:
            B[p, :len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    ar = np.arange(Lb + 1, dtype=np.int32)
    prev = np.broadcast_to(ar, (P, Lb + 1)).astype(np.int32).copy()
    res = np.empty(P, dtype=np.int32)
    done = np.flatnonzero(la == 0)
    res[done] = lb[done]
    for i in range(1, La + 1):
        cost = (A[:, i - 1:i] != B).astype(np.int32)
        t = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        t2 = np.concatenate(
            [np.full((P, 1), i, dtype=np.int32), t], axis=1)
        cur = np.minimum.accumulate(t2 - ar, axis=1) + ar
        prev = cur
        fin = np.flatnonzero(la == i)
        if len(fin):
            res[fin] = cur[fin, lb[fin]]
    return res


def levenshtein_ratio_many(pairs: list) -> list:
    """Batched levenshtein_ratio — values bit-identical to the scalar
    form (same integer distances, same final float expression). Used to
    pre-fill the fuzzy-dedup memo: the per-pair pure-Python DP was the
    measured hot spot of the whole flagship pipeline (~64% of extract
    wall time at bench scale)."""
    import numpy as np
    out = [0.0] * len(pairs)
    ix, s1s, s2s = [], [], []
    for i, (a, b) in enumerate(pairs):
        if a == b:
            out[i] = 1.0
        elif not a or not b:
            out[i] = 0.0
        else:
            ix.append(i)
            # row-loop the SHORTER string (lev is symmetric): the batch
            # DP iterates max(len(s1)) Python-level rows, so keeping the
            # short side on the row axis cuts iterations on mixed-length
            # batches without changing any distance
            if len(a) > len(b):
                a, b = b, a
            s1s.append(a)
            s2s.append(b)
    if not ix:
        return out
    # sort by (short, long) length and chunk: the batch DP pads every
    # pair to the chunk max, so one giant mixed-length batch pays
    # max-length rows × max-length columns for EVERY pair; sorted
    # chunks keep padding near-zero. Distances are per-pair independent
    # of batch composition (padding never reaches the read-out cell),
    # so re-batching is bit-identical.
    if len(ix) > 512:
        order = sorted(range(len(ix)),
                       key=lambda k: (len(s1s[k]), len(s2s[k])))
    else:
        order = range(len(ix))
    CHUNK = 4096
    buf_i, buf_1, buf_2 = [], [], []

    def flush():
        d = _levenshtein_dist_batch(buf_1, buf_2)
        for k, i in enumerate(buf_i):
            out[i] = float(1.0 - d[k] / max(len(buf_1[k]), len(buf_2[k])))
        buf_i.clear(), buf_1.clear(), buf_2.clear()

    for k in order:
        buf_i.append(ix[k])
        buf_1.append(s1s[k])
        buf_2.append(s2s[k])
        if len(buf_i) >= CHUNK:
            flush()
    if buf_i:
        flush()
    return out


def haversine_km(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """enhanced-deduplication.service.js:231-246."""
    r = 6371.0
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (math.sin(dlat / 2) ** 2
         + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
         * math.sin(dlon / 2) ** 2)
    return r * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
