"""N1-N12 semantics (reference tables transcribed; see normalize.py citations)."""

import math

from hypothesis import given, strategies as st

from web_crawler_ray.functions import normalize as N


def test_normalize_text():
    assert N.normalize_text("  a\n\nb   c ") == "a b c"
    assert N.normalize_text(None) == ""
    assert N.normalize_text("") == ""


def test_normalize_address_abbreviations():
    assert N.normalize_address("123 Main Street") == "123 Main St"
    assert N.normalize_address("5 Oak avenue,") == "5 Oak Ave"
    # JS quirk preserved: the 'ste.' table key's '.' is a regex wildcard, so
    # after 'Suite'→'Ste' the /\bste.\b/gi pass eats the following space
    # (address-normalizer.service.js:113-116 does exactly this).
    assert N.normalize_address("Suite 101 - 102") == "Ste101-102"
    # only the FIRST numeric range is tightened (JS non-global replace)
    assert N.normalize_address("1 - 2 and 3 - 4") == "1-2 and 3 - 4"


def test_normalize_state():
    assert N.normalize_state("california") == "CA"
    assert N.normalize_state(" new york ") == "NY"
    assert N.normalize_state("TX") == "TX"
    assert N.normalize_state("Bavaria") == "BAVARIA"


def test_normalize_postal():
    assert N.normalize_postal_code("123456789") == "12345-6789"
    assert N.normalize_postal_code("12345") == "12345"
    assert N.normalize_postal_code("k1a0b1") == "K1A 0B1"
    assert N.normalize_postal_code("EC1A 1BB") == "EC1A1BB"


def test_normalize_country():
    assert N.normalize_country("usa") == "US"
    assert N.normalize_country("United Kingdom") == "GB"
    assert N.normalize_country("de") == "DE"
    assert N.normalize_country("Atlantis") == "ATLANTIS"


def test_normalize_phone():
    assert N.normalize_phone("555-123-4567") == "(555) 123-4567"
    # JS checks length 11 on the plus-prefixed string (12 chars) — no reformat
    assert N.normalize_phone("+1 555 123 4567") == "+15551234567"
    assert N.normalize_phone("1-555-123-4567") == "+1-555-123-4567"
    assert N.normalize_phone("+44 20 7946 0958") == "+442079460958"


def test_canonical_key():
    assert N.canonical_key("Acme", "1 Main St", "Springfield", "62701") == \
        "acme|1mainst|springfield|62701"
    assert N.canonical_key(None, None, None, None, "1.5", "2.5") == "coord_1.5_2.5"
    assert N.canonical_key(None, None, None, None) is None


def test_iso2_to_iso3():
    assert N.iso2_to_iso3("US") == "USA"
    assert N.iso2_to_iso3("XX") == "XX"


def test_activity_and_height():
    assert N.guess_activity("Global Headquarters") == "Headquarters"
    assert N.guess_activity("our factory floor") == "Manufacturing"
    assert N.guess_activity("somewhere") == "Office"
    assert N.estimate_height("Headquarters") == 45.0
    assert N.estimate_height("Unknown") == 25.0


def test_footprint():
    wkt = N.create_footprint(37.5, -122.25)
    assert wkt.startswith("MULTIPOLYGON(((")
    assert "-122.250100 37.499900" in wkt
    assert wkt.count(",") == 4
    assert N.create_footprint(None, 1) is None
    assert N.create_footprint("", "") is None


def test_levenshtein_ratio():
    assert N.levenshtein_ratio("abc", "abc") == 1.0
    assert N.levenshtein_ratio("abc", "") == 0.0
    assert math.isclose(N.levenshtein_ratio("kitten", "sitting"), 1 - 3 / 7)


def test_haversine():
    assert N.haversine_km(0, 0, 0, 0) == 0.0
    # ~111 km per degree of latitude
    assert abs(N.haversine_km(0, 0, 1, 0) - 111.19) < 0.5


@given(st.text(max_size=80))
def test_normalize_text_idempotent(s):
    once = N.normalize_text(s)
    assert N.normalize_text(once) == once


@given(st.text(alphabet="0123456789- ()+", max_size=20))
def test_normalize_phone_total(s):
    N.normalize_phone(s)  # never raises


def test_levenshtein_batch_bit_identical_to_scalar():
    """levenshtein_ratio_many pre-fills the fuzzy-dedup memo, so its
    values must be BIT-identical to the scalar DP (score comparisons sit
    on exact float thresholds)."""
    import random
    import string
    from web_crawler_ray.functions.normalize import (
        levenshtein_ratio, levenshtein_ratio_many)
    rng = random.Random(13)
    pairs = [("", ""), ("", "abc"), ("abc", ""), ("ü", "u"),
             ("straße 5", "strasse 5")]
    for _ in range(300):
        a = "".join(rng.choices(string.ascii_lowercase + " 0123456789",
                                k=rng.randint(0, 45)))
        b = (a if rng.random() < 0.15 else
             a[:rng.randint(0, len(a))] + "xy" + a[rng.randint(0, len(a)):]
             if rng.random() < 0.5 else
             "".join(rng.choices(string.ascii_lowercase + " ",
                                 k=rng.randint(0, 45))))
        pairs.append((a, b))
    got = levenshtein_ratio_many(pairs)
    for i, (a, b) in enumerate(pairs):
        assert got[i] == levenshtein_ratio(a, b), (a, b)
