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
