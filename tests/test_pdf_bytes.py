"""S7/E11 binary PDF path: bytes -> stdlib text extraction -> locations
(pdf-extractor.service.js:9-38 arraybuffer+pdf-parse shape)."""

import ray
import ray.data as rd
import pytest

from web_crawler_ray.sources.pdf_bytes import (
    PdfTextStage, make_simple_pdf, pdf_extract_text, pdf_locations,
)

LINES = [
    "Annual Report 2024",
    "Our Offices",
    "Acme Corporation",
    "100 Main Street",
    "Springfield, IL 62701",
    "Tel: +1 555 0100",
]


def test_pdf_roundtrip_text():
    data = make_simple_pdf(LINES)
    assert data.startswith(b"%PDF") and b"endobj" in data
    text = pdf_extract_text(data)
    assert text.split("\n") == LINES


def test_pdf_escapes_and_garbage():
    data = make_simple_pdf(["Paren (deep) \\ backslash", "line2"])
    assert pdf_extract_text(data).split("\n") == \
        ["Paren (deep) \\ backslash", "line2"]
    assert pdf_extract_text(b"not a pdf") == ""
    assert pdf_extract_text(b"%PDF-1.4 truncated") == ""


def test_pdf_bytes_to_locations(ray_session, tmp_path):
    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(make_simple_pdf(LINES))
    (d / "b.pdf").write_bytes(make_simple_pdf(
        ["Contact Information", "Globex GmbH", "1 Ring Road",
         "London, EC1A 1BB", "phone: 020 7946 0000"]))
    ds = rd.read_binary_files(str(d), include_paths=True)
    out = pdf_locations(ds).to_pandas()
    assert len(out) >= 2
    assert (out["extraction_method"] == "pdf").all()
    us = out[out["postal_code"] == "62701"]
    assert len(us) == 1 and us.iloc[0]["state"] == "IL"
    assert us.iloc[0]["source_url"].endswith("a.pdf")
    uk = out[out["postal_code"].str.contains("1BB", na=False)]
    assert len(uk) >= 1 and (uk["country"] == "GBR").any()


@pytest.fixture(scope="module")
def ray_session():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield


def test_pdf_locations_query(ray_session):
    from web_crawler_ray.pipelines.queries import q_pdf_locations
    out = q_pdf_locations("/root/testdata/sf0.001").to_pandas()
    assert len(out) >= 4
    assert (out["country"] == "USA").any()
    out2 = q_pdf_locations("/root/testdata/sf0.001").to_pandas()
    assert out.sort_values(["source_url", "address"]).reset_index(drop=True).equals(
        out2.sort_values(["source_url", "address"]).reset_index(drop=True))


def test_pdf_locations_tolerates_undecodable_pdf(ray_session, tmp_path):
    """An undecodable PDF yields an empty block whose schema still
    unifies with location-bearing blocks (no pipeline crash)."""
    d = tmp_path / "mix"
    d.mkdir()
    (d / "good.pdf").write_bytes(make_simple_pdf(LINES))
    (d / "bad.pdf").write_bytes(b"%PDF-1.4 scanned image only, no streams")
    ds = rd.read_binary_files(str(d), include_paths=True)
    out = pdf_locations(ds).to_pandas()
    assert len(out) >= 1
    assert all(out["source_url"].str.endswith("good.pdf"))


def test_pdf_parser_never_crashes_on_fuzz():
    """pdf_extract_text is total: arbitrary bytes (including truncated
    headers, bogus streams, binary noise) return a string, never raise."""
    import random
    rng = random.Random(23)
    samples = [b"", b"%PDF", b"%PDF-1.7\nstream\n\x00\xff\x13garbage\nendstream",
               b"%PDF-1.4\nstream\n" + bytes(rng.randrange(256) for _ in range(500)),
               make_simple_pdf(["x"])[:60],  # truncated valid PDF
               b"%PDF" + bytes(rng.randrange(256) for _ in range(2000))]
    for s in samples:
        out = pdf_extract_text(s)
        assert isinstance(out, str)
