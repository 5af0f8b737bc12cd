"""E7 universal extractor semantics."""

from web_crawler_ray.functions.domlite import parse
from web_crawler_ray.stages import extract_universal as U

URL = "https://t.example/global-offices"


def test_component_finders():
    t = "Visit us at 100 Main Street, Seattle, WA 98101, United States"
    assert U.find_street(t) == "100 Main Street"
    assert U.find_postal(t) == "98101"
    assert U.find_state(t) == "WA"
    assert U.find_city(t) == "Seattle"
    assert U.extract_country_name(t) == "United States"
    assert U.contains_address_components(t)
    assert not U.contains_address_components("just words here")


def test_card_layout_with_country_context():
    html = """
    <h2> UNITED STATES </h2>
    <div class="location-card">
      <h4> Seattle </h4>
      <p> 100 Main Street </p>
      <p> Seattle, WA 98101 </p>
      <p> (555) 123-4567 </p>
    </div>"""
    locs = U.extract_cards(parse(html), URL)
    assert len(locs) >= 1
    l = locs[0]
    assert l["name"] == "Seattle"
    assert l["street"] == "100 Main Street"
    assert l["country"] in ("United States", "US", "USA")
    assert l["source_type"] == "card-extraction"


def test_jsonld_recursive_nested():
    html = """<script type="application/ld+json">
    {"@context": "x", "publisher": {"@type": "Organization", "name": "Acme",
      "address": {"streetAddress": "1 Plaza", "addressLocality": "Boston",
                  "postalCode": "02101"}}}</script>"""
    locs = U.extract_jsonld_recursive(parse(html), URL)
    assert len(locs) == 1 and locs[0]["name"] == "Acme"
    # string-address orgs are NOT emitted (E7 requires the address object)
    html2 = """<script type="application/ld+json">
    {"@type": "Organization", "name": "X", "address": "1 Plaza, Boston"}</script>"""
    assert U.extract_jsonld_recursive(parse(html2), URL) == []


def test_table_rows_no_gate():
    html = """<table><tr>
      <td> East branch office building </td>
      <td> 12 Oak Avenue, Denver, CO 80201 </td>
    </tr></table>"""
    locs = U.extract_tables(parse(html), URL)
    assert len(locs) == 1
    assert locs[0]["postal_code"] == "80201"


def test_universal_dedup_key():
    html = """
    <ul>
      <li> Our office: 99 Cedar Lane, Portland, OR 97201, United States </li>
    </ul>
    <div class="grid">
      <div> Office at 99 Cedar Lane, Portland, OR 97201, United States ok </div>
    </div>"""
    locs = U.extract_universal(parse(html), URL)
    keys = [(l["street"], l["city"], l["postal_code"]) for l in locs]
    assert len(keys) == len(set(keys))  # street|city|postal dedup applied
    assert all(l["extraction_method"] == "universal" for l in locs)
    assert all(l["confidence"] == 0.80 for l in locs)
