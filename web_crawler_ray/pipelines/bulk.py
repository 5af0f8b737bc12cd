"""Bulk pipeline (SURVEY §3.3: POST /api/bulk/upload).

Reference: CSV upload -> parse (header aliases) -> batches of 5 via
Promise.all (its only parallel path, bulk-processor.service.js:29-68)
-> full crawl per company -> summary rows -> 2-sheet Excel workbook.

Ray shape: ONE combined crawl over all companies' seeds (the frontier
is naturally per-host partitioned, so "batches of 5" becomes real
whole-fleet parallelism), then locations grouped back to companies by
source host for the summary + workbook.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import pyarrow as pa
import ray.data as rd

from ..sources.readers import bulk_summary, normalize_bulk_batch
from ..sources.xlsx import write_bulk_workbook
from .crawl import crawl
from .flagship import extract_locations
from ..stages.classify import classify_batch


def process_bulk(companies: pa.Table, pages_store: pa.Table,
                 robots: dict[str, str], workbook_path: str | None = None,
                 max_pages: int = 10_000, max_depth: int = 3,
                 round_seconds: float | None = 60.0) -> dict:
    """companies: (company_name, url) table (e.g. from read_bulk_csv).

    Returns {summary: list[dict], totals: dict, locations: Dataset}."""
    comp = normalize_bulk_batch(companies)
    names = comp.column("company_name").to_pylist()
    urls = comp.column("url").to_pylist()
    host_to_company = {urlsplit(u).netloc.lower(): n for n, u in zip(names, urls)}

    res = crawl(pages_store, robots, urls, max_pages=max_pages,
                max_depth=max_depth, round_seconds=round_seconds)
    locations = extract_locations(
        res.pages.map_batches(classify_batch, batch_format="pyarrow"))
    loc_rows = locations.to_pandas()

    def company_of(src: str) -> str:
        first = (src or "").split(",")[0].strip()
        return host_to_company.get(urlsplit(first).netloc.lower(), "Unknown")

    loc_rows["company_name"] = loc_rows["source_url"].map(company_of)
    counts = loc_rows.groupby("company_name").size().to_dict()
    visited_hosts = set(res.visited.column("host").to_pylist())
    summary = []
    for name, url in zip(names, urls):
        host = urlsplit(url).netloc.lower()
        n = int(counts.get(name, 0))
        status = "success" if host in visited_hosts else "failed"
        summary.append({"companyName": name, "url": url, "status": status,
                        "locationsCount": n})
    if workbook_path:
        write_bulk_workbook(workbook_path, summary,
                            loc_rows.to_dict("records"))
    totals_ds = rd.from_items([{"status": s["status"],
                                "locations_count": s["locationsCount"]}
                               for s in summary])
    return {"summary": summary, "totals": bulk_summary(totals_ds),
            "locations": locations}
