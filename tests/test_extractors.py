"""Unit fixtures per extractor behavior (SURVEY §2.3, FIXTURES.md §8)."""

import json

from web_crawler_ray.functions.domlite import parse
from web_crawler_ray.stages import extract as E

URL = "https://t.example/contact"


def test_jsonld_basic():
    html = """<html><body>
    <script type="application/ld+json">
    {"@type": "LocalBusiness", "name": "Acme",
     "address": {"streetAddress": "1 Main St", "addressLocality": "Springfield",
                 "addressRegion": "IL", "postalCode": "62701", "addressCountry": "US"},
     "geo": {"latitude": 37.1, "longitude": -122.2}, "telephone": "+1-555-000-1111"}
    </script></body></html>"""
    locs = E.extract_jsonld(parse(html), URL)
    assert len(locs) == 1
    l = locs[0]
    assert l["name"] == "Acme"
    assert l["address"] == "1 Main St, Springfield, IL, 62701, US"
    assert l["latitude"] == "37.1" and l["longitude"] == "-122.2"
    assert l["confidence"] == 0.95 and l["extraction_method"] == "json-ld"


def test_jsonld_graph_and_array_type():
    html = """<script type="application/ld+json">
    {"@graph": [
      {"@type": ["Place", "Thing"], "name": "Campus", "address": "9 Oak Ave, Denver, CO 80201"},
      {"@type": "WebSite", "name": "nope"},
      {"@type": "BranchOffice", "name": "NoAddr"}
    ]}</script>"""
    locs = E.extract_jsonld(parse(html), URL)
    # WebSite filtered by type; BranchOffice dropped (no address/coords)
    assert [l["name"] for l in locs] == ["Campus"]
    assert locs[0]["address"] == "9 Oak Ave, Denver, CO 80201"


def test_jsonld_substring_type_match():
    html = """<script type="application/ld+json">
    {"@type": "MedicalOrganization", "name": "Clinic", "address": "5 Elm Road, Boston, MA 02101"}
    </script>"""
    # 'Organization' substring matches (structured-data-extractor.service.js:66-84)
    assert len(E.extract_jsonld(parse(html), URL)) == 1


def test_microdata_content_attr_preference():
    html = """<div itemscope itemtype="https://schema.org/LocalBusiness">
      <span itemprop="name"> Acme East </span>
      <span itemprop="streetAddress"> 12 Lake Drive </span>
      <span itemprop="addressRegion" content="CO"> Colorado text ignored </span>
      <span itemprop="postalCode"> 80201 </span>
    </div>"""
    locs = E.extract_microdata(parse(html), URL)
    assert len(locs) == 1
    l = locs[0]
    assert l["state"] == "CO"
    assert l["name"] == "Acme East"
    assert l["address"] == "12 Lake Drive, CO, 80201"
    assert l["confidence"] == 0.90


def test_heuristic_semantic_and_bounds():
    # len must be >10 and <500 (heuristic-extractor:63)
    html = '<div class="contact-info"> 742 Evergreen Terrace, Springfield, IL 62704 </div>'
    locs = E.extract_heuristic(parse(html), URL)
    assert len(locs) == 1
    assert locs[0]["confidence"] == 0.7
    assert locs[0]["extraction_method"] == "heuristic"
    short = '<div class="address"> tiny </div>'
    assert E.extract_heuristic(parse(short), URL) == []


def test_heuristic_heading_walk():
    html = """<h2> Contact Us </h2>
    <p> filler that is long enough but has no address indicators at all here </p>
    <p> 100 Main Street, Springfield, IL 62701 </p>"""
    locs = E.extract_heuristic(parse(html), URL)
    heads = [l for l in locs if l["confidence"] == 0.8]
    assert len(heads) == 1
    assert heads[0]["name"] == "contact us"
    assert "100 Main Street" in heads[0]["address"]


def test_looks_like_address_bounds():
    assert E.looks_like_address("100 Main Street, Springfield IL")
    assert not E.looks_like_address("Main Street")          # <20 chars
    assert not E.looks_like_address("Main Street and more text but no digit here ok")
    assert not E.looks_like_address("x" * 401)


def test_heuristic_list_gate():
    html = """<ul>
      <li> Our office - 55 Cedar Court, Austin, TX 73301 </li>
      <li> 60 Hill Lane, Denver, CO 80201 </li>
    </ul>"""
    locs = E.extract_heuristic(parse(html), URL)
    # strategy order is observable: the text-pattern scan (0.6) sees these
    # lines BEFORE the list strategy, and first-seen dedup keeps the 0.6 row
    # (heuristic-extractor.service.js:15-27 strategy order + :222-240 dedup)
    assert sum(1 for l in locs if l["confidence"] == 0.6) == 2
    assert sum(1 for l in locs if l["confidence"] == 0.75) == 0
    # a keyword-only address (no street-type regex) is invisible to the
    # text-pattern scan but caught by the keyword-gated list strategy at 0.75
    kw = "<ul><li> Office zone with postal code 62701 nearby </li></ul>"
    locs2 = E.extract_heuristic(parse(kw), URL)
    assert [l["confidence"] for l in locs2] == [0.75]
    no_ctx = "<ul><li> Zone with postal code 62701 nearby x </li></ul>"
    locs3 = E.extract_heuristic(parse(no_ctx), URL)
    assert all(l["confidence"] != 0.75 for l in locs3)


def test_heuristic_dedup_first_seen():
    rows = [{"street": "100 Main Street Springfield!!", "confidence": 0.7, "name": ""},
            {"street": "100 main street springfield", "confidence": 0.6, "name": ""},
            {"street": "short", "confidence": 0.8, "name": ""}]
    out = E.dedup_heuristic(rows)
    assert len(out) == 1 and out[0]["confidence"] == 0.7


def test_phones_and_emails():
    html = """<body><p> Call (555) 123-4567 or +44 20 7946 0958 </p>
    <a href="tel:+1-555-999-0000"> call </a>
    <p> mail Info@Example.com </p>
    <a href="mailto:SALES@example.com?subject=hi"> mail </a></body>"""
    doc = parse(html)
    phones = E.extract_phones(doc)
    assert "(555) 123-4567" in phones
    assert "+1-555-999-0000" in phones
    emails = E.extract_emails(doc)
    assert emails == ["info@example.com", "sales@example.com"]


def test_map_iframe_coords():
    html = '<iframe src="https://www.google.com/maps/embed/@37.7749,-122.4194,15z"></iframe>'
    locs = E.extract_map_coords(parse(html), URL)
    assert len(locs) == 1
    assert locs[0]["latitude"] == "37.7749"
    assert locs[0]["extraction_method"] == "map-iframe"
    assert locs[0]["confidence"] == 0.90


def test_map_url_patterns():
    f = E._coords_from_map_url
    assert f("https://g/maps/@1.5,-2.5,15z") == (1.5, -2.5)
    assert f("https://g/maps/place/!3d37.1!4d-121.9") == (37.1, -121.9)
    assert f("https://g/maps?q=10.5,20.5") == (10.5, 20.5)
    assert f("https://g/maps?center=1.25,2.5") == (1.25, 2.5)
    assert f("https://g/maps?lat=3.5&lng=4.5") == (3.5, 4.5)
    assert f("https://osm.org/?mlat=5.5&mlon=6.5") == (5.5, 6.5)
    assert f("https://g/maps/noooo") is None


def test_data_attribute_coords():
    html = '<div data-lat="10.5" data-lng="-20.25"> x </div>'
    locs = E.extract_map_coords(parse(html), URL)
    assert len(locs) == 1
    assert locs[0]["extraction_method"] == "data-attribute"
    assert locs[0]["longitude"] == "-20.25"


def test_xhr_miner():
    data = {"results": {"offices": [
        {"name": "HQ", "address": "1 Main St", "city": "Springfield",
         "coordinates": {"lat": 1.5, "lng": 2.5}, "zip": "62701"},
        {"irrelevant": True},
    ]}}
    locs = E.mine_xhr_json(data, URL)
    # 2 rows: the office itself + the recursion into its `coordinates` object,
    # which alone satisfies hasCoords (playwright-renderer:227-231 recurses
    # into every nested object) — faithful duplicate, removed by dedup later
    assert len(locs) == 2
    assert locs[1]["name"] == "" and locs[1]["latitude"] == "1.5"
    l = locs[0]
    assert l["name"] == "HQ" and l["latitude"] == "1.5" and l["postal_code"] == "62701"
    assert l["confidence"] == 0.85 and l["extraction_method"] == "playwright-xhr"


def test_needs_js_rendering():
    sparse = "<html><body><div id='root'> Loading </div></body></html>"
    assert E.needs_js_rendering(sparse, parse(sparse))
    rich = "<html><body>" + "".join(
        f"<p> paragraph {i} with plenty of content to exceed the two hundred "
        f"character minimal content threshold easily </p>" for i in range(5)) + "</body></html>"
    assert not E.needs_js_rendering(rich, parse(rich))


def test_inline_script_locations():
    locs_json = json.dumps([{"name": "Site A", "address": "9 River Road, Austin, TX 73301",
                             "lat": 30.1, "lng": -97.7}])
    html = f"<script> var locations = {locs_json}; </script>"
    locs = E.extract_inline_script(parse(html), URL)
    assert len(locs) == 1
    assert locs[0]["extraction_method"] == "inline-script"
    assert locs[0]["confidence"] == 0.80


def test_extract_hrefs_order():
    html = '<a href="/b"> b </a> text <a class="x" href="/a"> a </a>'
    assert E.extract_hrefs(html) == ["/b", "/a"]


def test_span_assembly_interleaving():
    html = """<body><p> hello world </p>
    <img src="m://h/1">
    <p> after image </p>
    <iframe src="https://maps/x"></iframe></body>"""
    spans = E.assemble_spans(parse(html))
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "media", "text", "media"]
    assert spans[0]["text"] == "hello world"
    assert spans[1]["media_ref"] == "m://h/1"
    offs = [s["offset"] for s in spans]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)
    assert spans[2]["offset"] == len("hello world") + 1


def test_pdf_routing_in_extract_stage():
    """P3: application/pdf (or pdf-ish url) pages route to the E11 extractor."""
    import pyarrow as pa
    pdf_text = ("Our Offices\nAcme Springfield\n100 Main Street\n"
                "Springfield, IL 62701\n")
    batch = pa.table({
        "url": ["https://a.example/report.pdf", "https://a.example/contact"],
        "html": [pdf_text,
                 '<div class="contact-info"> 742 Evergreen Terrace, Springfield, IL 62704 </div>'],
        "xhr_json": [None, None],
        "discovery_seq": [0, 1],
        "content_type": ["application/pdf", "text/html"],
    })
    out = E.ExtractStage()(batch).to_pylist()
    methods = {r["source_url"]: {x["extraction_method"] for x in out
                                 if x["source_url"] == r["source_url"]}
               for r in out}
    assert "pdf" in methods["https://a.example/report.pdf"]
    assert "pdf" not in methods.get("https://a.example/contact", set())


def test_url_routing_predicates():
    from web_crawler_ray.functions import urltools as U
    assert U.is_pdf_url("https://a.example/x.PDF")
    assert U.is_pdf_url("https://a.example/x.pdf?dl=1")
    assert U.is_pdf_url("https://a.example/pdf/annual")
    assert not U.is_pdf_url("https://a.example/x.html")
    assert U.is_document_url("https://a.example/a.docx")
    assert not U.is_document_url("https://a.example/a.html")
    assert U.is_homepage("https://a.example/")
    assert U.is_homepage("https://a.example")
    assert not U.is_homepage("https://a.example/x")
