"""N13 multi-provider geocoding chain (multi-geocoding.service.js:8-263):
fallback order, rate budgets, reverse geocode, place details."""

import pyarrow as pa
import pytest
import ray
import ray.data as rd

from web_crawler_ray.functions.hashing import hash64
from web_crawler_ray.state.geocode_chain import (
    EMPTY_RESULT, GoogleProvider, MapQuestProvider, MultiGeocoder,
    NominatimProvider, ProviderError,
)


def _addr_with_residue(residue: int) -> str:
    i = 0
    while True:
        a = f"{100 + i} Main Street, Springfield, IL 62701 v{i}"
        if hash64(a.strip().lower()) % 5 == residue:
            return a
        i += 1


def test_fallback_order_google_first():
    g = MultiGeocoder()
    a = _addr_with_residue(1)  # google-resolvable
    r = g.geocode_with_fallback(a)
    assert r["provider"] == "Google Maps" and r["latitude"]
    assert r["placeId"].startswith("place_")
    a0 = _addr_with_residue(0)  # google misses -> nominatim resolves
    r0 = g.geocode_with_fallback(a0)
    assert r0["provider"] == "Nominatim" and r0["latitude"]
    assert "placeId" not in r0


def test_unconfigured_google_falls_through():
    g = MultiGeocoder(google=GoogleProvider(configured=False))
    a = _addr_with_residue(1)  # nominatim can't resolve residue 1
    r = g.geocode_with_fallback(a)
    assert r["provider"] == "MapQuest" and r["latitude"]
    assert g.stats["Google Maps"]["ok"] == 0


def test_rate_budget_exhaustion_falls_through():
    g = MultiGeocoder(google=GoogleProvider(budget=1))
    a1, a2 = _addr_with_residue(1), _addr_with_residue(2)
    assert g.geocode_with_fallback(a1)["provider"] == "Google Maps"
    assert g.geocode_with_fallback(a2)["provider"] == "MapQuest"  # 429 analog
    # memo: the first address is cached, costs no second call
    assert g.geocode_with_fallback(a1)["provider"] == "Google Maps"
    assert g.google.calls == 1


def test_all_fail_returns_empty():
    g = MultiGeocoder(google=GoogleProvider(configured=False),
                      nominatim=NominatimProvider(budget=0),
                      mapquest=MapQuestProvider(configured=False))
    r = g.geocode_with_fallback(_addr_with_residue(0))
    assert {k: r[k] for k in EMPTY_RESULT} == EMPTY_RESULT
    assert r["provider"] == ""


def test_reverse_geocode_and_fallback():
    g = MultiGeocoder()
    r = g.reverse_geocode(41.88, -87.63)
    assert r is not None and r["formattedAddress"] == "41.88,-87.63"
    g2 = MultiGeocoder(google=GoogleProvider(configured=False))
    r2 = g2.reverse_geocode(41.88, -87.63)
    assert r2 is not None  # nominatim fallback (:136-154)
    g3 = MultiGeocoder(google=GoogleProvider(configured=False),
                       nominatim=NominatimProvider(budget=0))
    assert g3.reverse_geocode(41.88, -87.63) is None


def test_place_details_google_only():
    g = MultiGeocoder()
    d = g.get_place_details("place_123")
    assert d["phone"].startswith("+1 555") and d["types"] == ["point_of_interest"]
    assert g.get_place_details("") == {"phone": "", "website": "", "hours": "",
                                       "rating": "", "types": []}
    g2 = MultiGeocoder(google=GoogleProvider(configured=False))
    assert g2.get_place_details("place_123")["phone"] == ""


def test_chain_as_actor_pool_stage(ray_session):
    addrs = [_addr_with_residue(i % 5) for i in range(20)]
    ds = rd.from_arrow(pa.table({"address": pa.array(addrs, pa.string())}))
    out = ds.map_batches(MultiGeocoder, batch_format="pyarrow",
                         concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 20
    assert (out["geo_latitude"] != "").all()   # mapquest backstops everything
    assert set(out["geo_provider"]) >= {"Google Maps", "Nominatim"}


@pytest.fixture(scope="module")
def ray_session():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
