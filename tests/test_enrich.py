"""Enrichment + quality (A1/A2, N11-N13) semantics."""

import pyarrow as pa

from web_crawler_ray.stages import enrich as E


def test_quality_score_weights():
    full = {"location_name": "Acme", "location_address": "100 Main Street, X",
            "latitude": "37.0", "longitude": "-122.0", "country_iso3": "USA",
            "postcode": "62701", "state": "IL", "street_or_city": "Springfield",
            "activity_at_asset": "Office", "footprint": "MULTIPOLYGON(...)",
            "height": 30.0, "phone": "555", "email": "a@b.c"}
    # all 13 weights (100) + geocode bonus 5 -> clamped to 100
    assert E.quality_score(full) == 100
    assert E.quality_level(100) == "Excellent"
    empty = {k: "" for k in full}
    assert E.quality_score(empty) == 0
    # short-address penalty
    short = dict(full, location_address="tiny addr")
    assert E.quality_score(short) == 95  # 100(weights)+5(geo)-10(short addr), then clamp
    # 'unknown' penalty
    unk = dict(full, location_address="unknown")
    assert E.quality_score(unk) < E.quality_score(short)


def test_quality_score_zero_coord_no_bonus():
    loc = {"location_name": "A", "latitude": "0", "longitude": "0"}
    # lat/lon present (weights count: 10+15+15=40) but 0,0 gets no +5 bonus
    assert E.quality_score(loc) == 40


def test_synthetic_geocode_deterministic():
    g1 = E.synthetic_geocode("100 Main Street, Springfield, IL 62701")
    g2 = E.synthetic_geocode("100 Main Street, Springfield, IL 62701")
    assert g1 == g2
    assert g1["city"] == "Springfield" and g1["state"] == "IL"
    assert g1["postalCode"] == "62701" and g1["countryCode"] == "USA"
    assert 25 <= float(g1["latitude"]) <= 49
    assert E.synthetic_geocode("")["latitude"] == ""


def test_enrich_stage_shapes():
    batch = pa.Table.from_pylist([{
        "name": "Acme", "address": "100 Main Street, Springfield, IL 62701",
        "street": "", "city": "", "state": "", "postal_code": "", "country": "",
        "latitude": "", "longitude": "", "phone": "", "email": "",
        "activity": "", "extraction_method": "json-ld", "confidence": 0.95,
        "discovery_seq": 3, "within_page_idx": 0,
        "source_url": "https://a.example/contact",
    }])
    out = E.geocode_enrich_batch(batch)
    row = out.to_pylist()[0]
    assert row["location_name"] == "Acme"
    assert row["country_iso3"] == "USA"
    assert row["footprint"].startswith("MULTIPOLYGON")
    assert row["height"] == 30.0           # Office
    assert row["usage_share"] == "Exclusive"
    assert row["source_type"] == "Company Website"
    q = E.add_quality(out).to_pylist()[0]
    assert q["quality_score"] > 70
    assert q["quality_level"] in ("Good", "Excellent")


def test_filter_valid():
    t = pa.Table.from_pylist([
        {"location_name": "Unknown Location", "location_address": "",
         "latitude": "", "longitude": "", "street_or_city": ""},           # invalid
        {"location_name": "Unknown Location", "location_address": "",
         "latitude": "1", "longitude": "2", "street_or_city": ""},         # coords
        {"location_name": "Acme", "location_address": "addr",
         "latitude": "", "longitude": "", "street_or_city": ""},           # name+addr
    ])
    out = E.filter_valid(t)
    assert out.num_rows == 2


def test_filter_valid_numeric_coordinates():
    """ADVICE r3: numeric lat/lon columns must follow scalar bool(v)
    truthiness — 0.0 is NOT a present coordinate, while the STRING
    '0.0' is (non-empty string). Scalar/vector equality pinned on the
    numeric schema."""
    t = pa.table({
        "location_name": pa.array(["Unknown Location"] * 4, pa.string()),
        "location_address": pa.array([""] * 4, pa.string()),
        "street_or_city": pa.array([""] * 4, pa.string()),
        "latitude": pa.array([0.0, 1.5, 0.0, None], pa.float64()),
        "longitude": pa.array([0.0, 2.5, 3.5, 4.5], pa.float64()),
    })
    out = E.filter_valid(t)
    # only the (1.5, 2.5) row has truthy coords; 0.0 and null are falsy
    assert out.column("latitude").to_pylist() == [1.5]
    for rec, keep in zip(t.to_pylist(), [False, True, False, False]):
        assert E.is_valid_location(rec) == keep
    # string "0.0" stays truthy (bool of a non-empty string)
    s = pa.table({
        "location_name": pa.array(["Unknown Location"], pa.string()),
        "location_address": pa.array([""], pa.string()),
        "street_or_city": pa.array([""], pa.string()),
        "latitude": pa.array(["0.0"], pa.string()),
        "longitude": pa.array(["0.0"], pa.string()),
    })
    assert E.filter_valid(s).num_rows == 1


def test_enrich_with_chain_backend(ray_session):
    """backend='chain' routes lookups through the multi-provider fallback
    chain with the identical output schema (MapQuest backstops, so every
    coordinate-less row still gets geocoded)."""
    import pandas as pd
    import ray.data as rd
    from web_crawler_ray.stages.enrich import GeocodeEnrichStage
    rows = [{"name": f"Co {i}", "address": f"{100+i} Main Street, Springfield, IL 62701",
             "latitude": "", "longitude": "", "city": "", "state": "",
             "postal_code": "", "country": "", "phone": "", "email": "",
             "source_url": "https://h.example/a", "extraction_method": "jsonld",
             "confidence": 0.9, "discovery_seq": i, "street": "", "activity": ""}
            for i in range(12)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = ds.map_batches(GeocodeEnrichStage(backend="chain"),
                         batch_format="pyarrow", concurrency=1).to_pandas()
    base = ds.map_batches(GeocodeEnrichStage(), batch_format="pyarrow",
                          concurrency=1).to_pandas()
    assert list(out.columns) == list(base.columns)
    assert len(out) == 12 and (out["latitude"] != "").all()
    assert (out["postcode"] == "62701").all()


def _enrich_spec_row(r, geocoder):
    """The original per-row-dict enrichment — the spec the vectorized
    stage must reproduce field-for-field."""
    from web_crawler_ray.functions.normalize import (
        create_footprint, estimate_height, guess_activity, iso2_to_iso3,
        normalize_country)
    addr = r.get("address") or ""
    has_coords = r.get("latitude") and r.get("longitude")
    geo = geocoder(addr) if (addr and not has_coords) else None
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
    return {
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
    }


def test_vectorized_enrich_quality_validity_match_rowwise_spec():
    """Round-3 vectorization of GeocodeEnrichStage / add_quality /
    filter_valid must be field-for-field identical to the row-wise spec
    over a fuzzed batch (falsy variants, missing coords, weird addrs)."""
    import random
    import pyarrow as pa
    from web_crawler_ray.stages.enrich import (
        GeocodeEnrichStage, add_quality, filter_valid, is_valid_location,
        quality_level, quality_score, synthetic_geocode)
    rng = random.Random(7)
    addrs = ["", "12 Main Street, Springfield, IL 62704", "unknown", "n/a",
             "short st", "Hauptstr. 5, Berlin", None]
    names = ["", None, "Acme HQ", "Retail store #4", "Plant 9 factory"]
    rows = []
    for i in range(300):
        rows.append({
            "source_url": rng.choice(["", "https://x.example/warehouse", None,
                                      "https://y.example/contact"]),
            "name": rng.choice(names),
            "address": rng.choice(addrs),
            "street": rng.choice(["", "Oak Ave", None]),
            "city": rng.choice(["", "Paris", None]),
            "state": rng.choice(["", "IL", None]),
            "postal_code": rng.choice(["", "62704", None]),
            "country": rng.choice(["", "us", "germany", None]),
            "latitude": rng.choice(["", "41.2", "0", None]),
            "longitude": rng.choice(["", "-89.1", "0", None]),
            "phone": rng.choice(["", "+1 555 0100"]),
            "email": rng.choice(["", "a@b.co"]),
            "activity": rng.choice(["", "Retail", None]),
            "extraction_method": "heuristic",
            "confidence": rng.choice([0.7, 0.9, None]),
            "discovery_seq": rng.choice([i, None]),
        })
    batch = pa.Table.from_pylist(rows)
    got = GeocodeEnrichStage()(batch).to_pylist()
    memo = {}
    def geocoder(a):
        if a not in memo:
            memo[a] = synthetic_geocode(a)
        return memo[a]
    for i, r in enumerate(rows):
        assert got[i] == _enrich_spec_row(r, geocoder), (i, r)
    enr = pa.Table.from_pylist(got)
    q = add_quality(enr)
    qs = q.column("quality_score").to_pylist()
    ql = q.column("quality_level").to_pylist()
    for i, rec in enumerate(got):
        assert qs[i] == quality_score(rec), (i, rec)
        assert ql[i] == quality_level(qs[i])
    kept = filter_valid(q)
    expect_n = sum(1 for rec in q.to_pylist() if is_valid_location(rec))
    assert kept.num_rows == expect_n
