"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl->extract->dedup->enrich pipeline on a
small deterministic synthetic world (the crawl engine's input is the
synthetic web, per BASELINE input_hint) and returns the final enriched
locations Dataset. ``queries()`` exposes every implemented operator
family over ``/root/testdata/sf*`` (+ the synthetic crawl world);
``oracle_sql()`` gives DuckDB equivalents for the SQL-expressible ones.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at smoke scale; driver checks rows >= 0."""
    from web_crawler_ray.pipelines.flagship import run_flagship
    out = run_flagship(n_hosts=4, pages_per_host_base=12,
                       max_pages=100, round_seconds=60.0)
    return out["locations"]


def queries() -> dict[str, Callable[[str], Any]]:
    from web_crawler_ray.pipelines.queries import registry
    return registry()


def oracle_sql() -> dict[str, str]:
    from web_crawler_ray.pipelines.queries import ORACLES
    return dict(ORACLES)
