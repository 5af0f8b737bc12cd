"""Enrichment: geocoding actor pool, final-record assembly, quality (A1/A2, N11-N13).

- Geocoder (N13): the reference chains OpenCage -> Google with a Redis
  memo (geocoding.service.js:13-97). In-sandbox there is no network, so
  the stage is a DETERMINISTIC synthetic geocoder with the identical
  output schema: parse city/state/zip from the address text; coords
  from a seeded hash when the record has none. It runs as a stateful
  ``map_batches`` actor pool (memo cache per actor = the Redis stand-in;
  rate-limited external API at production).
- Final record assembly: crawler.service.js:449-464 field mapping.
- Quality score A2: data-quality.service.js:7-48 weights verbatim;
  report A1 (:114-136) as a Ray aggregate.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.hashing import hash64
from ..functions.normalize import (
    create_footprint, estimate_height, guess_activity, iso2_to_iso3,
    normalize_country, US_STATES,
)

_CITY_STATE_ZIP_RE = re.compile(r",\s*([A-Za-z .]+),\s*([A-Z]{2})\s+(\d{5})(?:-\d{4})?")
_STATE_CODES = frozenset(US_STATES.values())


def synthetic_geocode(address: str, name: str = "") -> dict:
    """Deterministic geocode with geocoding.service.js output shape."""
    out = {"formattedAddress": address or "", "latitude": "", "longitude": "",
           "countryCode": "", "postalCode": "", "state": "", "city": ""}
    if not address:
        return out
    m = _CITY_STATE_ZIP_RE.search(address)
    if m:
        out["city"] = m.group(1).strip()
        out["state"] = m.group(2)
        out["postalCode"] = m.group(3)
        out["countryCode"] = "USA"
    h = hash64(address.strip().lower())
    out["latitude"] = str(round(25 + (h % 240_000) / 10_000.0, 4))
    out["longitude"] = str(round(-124 + ((h >> 20) % 570_000) / 10_000.0, 4))
    return out


class GeocodeEnrichStage:
    """Enrichment stage: locations_raw -> final enriched records.

    The memo cache is the reference's 30-day Redis geocode cache. With a
    REAL geocoder (rate-limited HTTP) this runs as an actor pool
    (``map_batches(GeocodeEnrichStage, concurrency=N)``) so the session +
    cache live once per actor; the sandbox's synthetic geocoder is pure
    CPU, so the flagship uses the stateless-task form
    (``geocode_enrich_batch`` below, per-worker memo) — elastic, no
    actor-pool startup, and it keeps the upstream extract stages from
    being fused into a small fixed pool.

    ``backend="chain"`` routes lookups through the N13 multi-provider
    fallback chain (state/geocode_chain.MultiGeocoder: Google ->
    Nominatim -> MapQuest with per-provider rate budgets) instead of
    the single synthetic geocoder — the production shape, one chain
    (memo + budgets) per actor/worker. Output schema is identical.
    """

    def __init__(self, backend: str = "synthetic"):
        self.memo: dict[str, dict] = {}
        self.chain = None
        if backend == "chain":
            from ..state.geocode_chain import MultiGeocoder
            self.chain = MultiGeocoder()

    def _geocode(self, address: str) -> dict:
        g = self.memo.get(address)
        if g is None:
            if self.chain is not None:
                r = self.chain.geocode_with_fallback(address)
                g = {"formattedAddress": r.get("formattedAddress", ""),
                     "latitude": r.get("latitude", ""),
                     "longitude": r.get("longitude", ""),
                     "countryCode": r.get("countryCode", ""),
                     "postalCode": r.get("postcode", ""),
                     "state": r.get("state", ""),
                     "city": r.get("city", "")}
            else:
                g = synthetic_geocode(address)
            if len(self.memo) < 100_000:
                self.memo[address] = g
        return g

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = []
        for r in rows:
            addr = r.get("address") or ""
            has_coords = r.get("latitude") and r.get("longitude")
            geo = self._geocode(addr) if (addr and not has_coords) else None
            lat = r.get("latitude") or (geo["latitude"] if geo else "")
            lon = r.get("longitude") or (geo["longitude"] if geo else "")
            country = r.get("country") or ""
            iso3 = iso2_to_iso3(normalize_country(country)) if country else \
                (geo["countryCode"] if geo else "")
            activity = r.get("activity") or guess_activity(
                f"{r.get('name') or ''} {addr} {r.get('source_url') or ''}")
            state = r.get("state") or (geo["state"] if geo else "")
            city = r.get("city") or (geo["city"] if geo else "")
            post = r.get("postal_code") or (geo["postalCode"] if geo else "")
            out.append({
                "location_name": r.get("name") or "Unknown Location",
                "location_address": addr,
                "activity_at_asset": activity,
                "latitude": str(lat) if lat else "",
                "longitude": str(lon) if lon else "",
                "country_iso3": iso3,
                "postcode": str(post) if post else "",
                "state": state,
                "street_or_city": city or (r.get("street") or ""),
                "footprint": create_footprint(lat, lon) or "",
                "height": estimate_height(activity),
                "usage_share": "Exclusive",
                "source_url": r.get("source_url") or "",
                "source_type": "Company Website",
                "extraction_method": r.get("extraction_method") or "",
                "confidence": float(r.get("confidence") or 0.0),
                "discovery_seq": int(r.get("discovery_seq") or 0),
                "phone": r.get("phone") or "",
                "email": r.get("email") or "",
            })
        return pa.Table.from_pylist(out) if out else _EMPTY_ENRICHED


_EMPTY_ENRICHED = pa.table({
    "location_name": pa.array([], pa.string()),
    "location_address": pa.array([], pa.string()),
    "activity_at_asset": pa.array([], pa.string()),
    "latitude": pa.array([], pa.string()),
    "longitude": pa.array([], pa.string()),
    "country_iso3": pa.array([], pa.string()),
    "postcode": pa.array([], pa.string()),
    "state": pa.array([], pa.string()),
    "street_or_city": pa.array([], pa.string()),
    "footprint": pa.array([], pa.string()),
    "height": pa.array([], pa.float64()),
    "usage_share": pa.array([], pa.string()),
    "source_url": pa.array([], pa.string()),
    "source_type": pa.array([], pa.string()),
    "extraction_method": pa.array([], pa.string()),
    "confidence": pa.array([], pa.float64()),
    "discovery_seq": pa.array([], pa.int64()),
    "phone": pa.array([], pa.string()),
    "email": pa.array([], pa.string()),
})

_WORKER_ENRICH: list = []  # per-worker-process GeocodeEnrichStage singleton


def geocode_enrich_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task form of GeocodeEnrichStage (memo cached per worker)."""
    if not _WORKER_ENRICH:
        _WORKER_ENRICH.append(GeocodeEnrichStage())
    return _WORKER_ENRICH[0](batch)


# --- A2 quality score (data-quality.service.js:7-48, weights verbatim) ------

QUALITY_WEIGHTS = {
    "location_name": 10, "location_address": 20, "latitude": 15, "longitude": 15,
    "country_iso3": 10, "postcode": 8, "state": 5, "street_or_city": 5,
    "activity_at_asset": 5, "footprint": 3, "height": 2, "phone": 1, "email": 1,
}


def quality_score(loc: dict) -> int:
    score = 0
    for f, w in QUALITY_WEIGHTS.items():
        v = loc.get(f)
        if v is not None and len(str(v)) > 0:
            score += w
    lat, lon = loc.get("latitude"), loc.get("longitude")
    try:
        if lat and lon and float(lat) != 0 and float(lon) != 0:
            score += 5
    except ValueError:
        pass
    addr = loc.get("location_address")
    if addr:
        low = addr.lower()
        if len(low) < 10:
            score -= 10
        if low in ("unknown", "n/a"):
            score -= 20
    return max(0, min(100, score))


def quality_level(score: int) -> str:
    if score >= 90:
        return "Excellent"
    if score >= 70:
        return "Good"
    if score >= 50:
        return "Fair"
    return "Poor"


def add_quality(batch: pa.Table) -> pa.Table:
    rows = batch.to_pylist()
    scores = [quality_score(r) for r in rows]
    levels = [quality_level(s) for s in scores]
    out = batch
    for name in ("quality_score", "quality_level"):
        if name in out.column_names:
            out = out.drop_columns([name])
    out = out.append_column("quality_score", pa.array(scores, pa.int32()))
    return out.append_column("quality_level", pa.array(levels, pa.string()))


def quality_report(ds) -> dict:
    """A1 (data-quality:114-136) as Ray aggregates (single small result)."""
    from ray.data.aggregate import Count, Mean

    def bucket(batch: pa.Table) -> pa.Table:
        s = batch.column("quality_score")
        lv = [quality_level(int(x)) for x in s.to_pylist()]
        return batch.append_column("bucket", pa.array(lv, pa.string()))

    agg = (ds.map_batches(bucket, batch_format="pyarrow")
             .groupby("bucket").aggregate(Count(alias_name="n")).to_pandas())
    mean = ds.aggregate(Mean("quality_score", alias_name="avg"))["avg"]
    counts = dict(zip(agg["bucket"], agg["n"]))
    return {
        "totalLocations": int(agg["n"].sum()),
        "excellent": int(counts.get("Excellent", 0)),
        "good": int(counts.get("Good", 0)),
        "fair": int(counts.get("Fair", 0)),
        "poor": int(counts.get("Poor", 0)),
        "averageScore": float(mean),
    }


# --- P5 validity filter (address-normalizer.service.js:340-363) --------------

def is_valid_location(r: dict) -> bool:
    has_coords = bool(r.get("latitude") and r.get("longitude"))
    has_name = bool(r.get("location_name") and r["location_name"] != "Unknown Location")
    has_addr = bool(r.get("location_address"))
    has_city = bool(r.get("street_or_city"))
    return has_coords or (has_name and (has_addr or has_city)) or (has_addr and has_city)


def filter_valid(batch: pa.Table) -> pa.Table:
    mask = [is_valid_location(r) for r in batch.to_pylist()]
    return batch.filter(pa.array(mask))
