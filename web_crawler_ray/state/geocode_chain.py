"""N13 multi-provider geocoding chain (multi-geocoding.service.js:8-263).

Architecture transcribed from the reference:
- ``geocode_with_fallback``: providers tried IN ORDER (Google ->
  Nominatim -> MapQuest, :10-14); a provider "succeeds" when it yields
  latitude+longitude (:20); failures (unconfigured key, rate limit, no
  result) are caught and the chain falls through (:24-26); all-fail
  returns the empty result (:29-30, :276-289).
- ``reverse_geocode`` (:114-161): Google first when configured, else
  Nominatim; returns formattedAddress + the parsed fields; None on
  total failure.
- ``get_place_details`` (:166-203): Google-only, returns
  phone/website/hours/rating/types with ''/[] defaults on failure.
- Per-provider output schemas follow parseGoogleResult /
  parseNominatimResult / parseMapQuestResult (:208-263): all share the
  (latitude, longitude, formattedAddress, streetNumber, street, city,
  state, postcode, country, countryCode) keys; Google adds placeId.

No network in this sandbox, so each provider wraps the DETERMINISTIC
synthetic backend (stages/enrich.synthetic_geocode) with per-provider
availability (seeded by the address hash — so fallback paths are
exercised deterministically), a per-provider rate budget (token count
per actor — the production rate-limit analog; an exhausted budget
raises exactly like an HTTP 429), and a configured flag (the API-key
analog). The chain runs as a ``map_batches`` actor-pool stage or behind
``ray.remote`` (one chain per actor: memo + budgets are per-actor state,
the Redis-memo analog of geocoding.service.js).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import hash64
from ..stages.enrich import synthetic_geocode

EMPTY_RESULT = {
    "latitude": "", "longitude": "", "formattedAddress": "",
    "streetNumber": "", "street": "", "city": "", "state": "",
    "postcode": "", "country": "", "countryCode": "",
}


class ProviderError(Exception):
    """A provider failed (unconfigured / rate-limited / no result)."""


class _BaseProvider:
    """Synthetic provider: deterministic availability + rate budget."""

    name = "base"
    #: address-hash residues this provider can resolve (mod 5) — chosen so
    #: every provider's success AND failure paths are reachable
    _resolves = frozenset()

    def __init__(self, configured: bool = True, budget: int | None = None):
        self.configured = configured
        self.budget = budget  # None = unlimited
        self.calls = 0

    def _spend(self) -> None:
        if not self.configured:
            raise ProviderError(f"{self.name} API key not configured")
        if self.budget is not None and self.calls >= self.budget:
            raise ProviderError(f"{self.name} rate limit exceeded")
        self.calls += 1

    def _available(self, address: str) -> bool:
        return (hash64(address.strip().lower()) % 5) in self._resolves

    def geocode(self, address: str) -> dict:
        self._spend()
        if not address or not self._available(address):
            raise ProviderError(f"{self.name} geocoding returned no results")
        return self.parse(synthetic_geocode(address), address)

    def reverse(self, lat: float, lng: float) -> dict:
        self._spend()
        addr = f"{round(float(lat), 4)},{round(float(lng), 4)}"
        base = synthetic_geocode(addr)
        out = self.parse(base, addr)
        out["formattedAddress"] = addr
        return out

    def parse(self, base: dict, address: str) -> dict:  # pragma: no cover
        raise NotImplementedError


class GoogleProvider(_BaseProvider):
    """parseGoogleResult shape (:208-225): adds placeId."""

    name = "Google Maps"
    _resolves = frozenset({1, 2, 3})

    def parse(self, base: dict, address: str) -> dict:
        out = dict(EMPTY_RESULT)
        out.update({
            "latitude": base["latitude"], "longitude": base["longitude"],
            "formattedAddress": base["formattedAddress"],
            "city": base["city"], "state": base["state"],
            "postcode": base["postalCode"],
            "country": base["countryCode"], "countryCode": base["countryCode"],
            "placeId": f"place_{hash64(address) % 10**9}",
        })
        return out


class NominatimProvider(_BaseProvider):
    """parseNominatimResult shape (:230-245): no placeId, no key needed."""

    name = "Nominatim"
    _resolves = frozenset({0, 4})

    def __init__(self, budget: int | None = None):
        super().__init__(configured=True, budget=budget)  # free, keyless

    def parse(self, base: dict, address: str) -> dict:
        out = dict(EMPTY_RESULT)
        out.update({
            "latitude": base["latitude"], "longitude": base["longitude"],
            "formattedAddress": base["formattedAddress"],
            "city": base["city"], "state": base["state"],
            "postcode": base["postalCode"],
            "country": base["countryCode"],
            "countryCode": base["countryCode"].upper(),
        })
        return out


class MapQuestProvider(_BaseProvider):
    """parseMapQuestResult shape (:250-263)."""

    name = "MapQuest"
    _resolves = frozenset({0, 1, 2, 3, 4})  # backup: resolves anything

    def parse(self, base: dict, address: str) -> dict:
        out = dict(EMPTY_RESULT)
        out.update({
            "latitude": base["latitude"], "longitude": base["longitude"],
            "formattedAddress": f"{base['latitude']},{base['longitude']}",
            "street": base["formattedAddress"],
            "streetNumber": base["formattedAddress"],
            "city": base["city"], "state": base["state"],
            "postcode": base["postalCode"],
            "country": base["countryCode"], "countryCode": base["countryCode"],
        })
        return out


class MultiGeocoder:
    """The fallback chain + memo. One instance per actor/worker."""

    def __init__(self, google: GoogleProvider | None = None,
                 nominatim: NominatimProvider | None = None,
                 mapquest: MapQuestProvider | None = None):
        self.google = google if google is not None else GoogleProvider()
        self.nominatim = nominatim if nominatim is not None else NominatimProvider()
        self.mapquest = mapquest if mapquest is not None else MapQuestProvider()
        self.providers = [self.google, self.nominatim, self.mapquest]
        self.memo: dict[str, dict] = {}
        self.stats = {p.name: {"tried": 0, "ok": 0} for p in self.providers}

    def geocode_with_fallback(self, address: str) -> dict:
        """:8-31 — first provider yielding lat+lng wins; errors fall
        through; all-fail -> EMPTY_RESULT. Memoized per instance."""
        hit = self.memo.get(address)
        if hit is not None:
            return hit
        result = dict(EMPTY_RESULT)
        result["provider"] = ""
        for p in self.providers:
            self.stats[p.name]["tried"] += 1
            try:
                r = p.geocode(address)
            except ProviderError:
                continue
            if r.get("latitude") and r.get("longitude"):
                self.stats[p.name]["ok"] += 1
                r["provider"] = p.name
                result = r
                break
        if len(self.memo) < 100_000:
            self.memo[address] = result
        return result

    def reverse_geocode(self, lat, lng) -> dict | None:
        """:114-161 — Google when configured, else Nominatim; None on
        total failure."""
        for p in (self.google, self.nominatim):
            try:
                return p.reverse(lat, lng)
            except ProviderError:
                continue
        return None

    def get_place_details(self, place_id: str, place_name: str = "",
                          address: str = "") -> dict:
        """:166-203 — Google-only enrichment; ''/[] defaults otherwise."""
        details = {"phone": "", "website": "", "hours": "", "rating": "",
                   "types": []}
        if not place_id:
            return details
        try:
            self.google._spend()
        except ProviderError:
            return details
        h = hash64(place_id)
        details["phone"] = f"+1 555 {h % 10000:04d}"
        details["website"] = f"https://{place_id}.example/"
        details["rating"] = str(round(3.0 + (h % 20) / 10.0, 1))
        details["types"] = ["point_of_interest"]
        return details

    # --- map_batches stage form ---------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Actor-pool stage: address column -> chain outputs (+provider)."""
        addrs = batch.column("address").to_pylist()
        res = [self.geocode_with_fallback(a or "") for a in addrs]
        out = batch
        for key, typ in (("latitude", pa.string()), ("longitude", pa.string()),
                         ("city", pa.string()), ("state", pa.string()),
                         ("postcode", pa.string()),
                         ("countryCode", pa.string()),
                         ("provider", pa.string())):
            out = out.append_column(
                f"geo_{key}", pa.array([str(r.get(key, "")) for r in res], typ))
        return out
