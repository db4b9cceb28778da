"""URL-space analytics for crawl scheduling.

The reference crawls whatever it discovers (src/crawler.go:96-313 has no
URL-space model); at web scale the frontier must detect *spider traps* —
hosts whose URL space is generated (calendars, session ids, faceted
search) and therefore unbounded.  The standard signal (Heydon & Najork,
"Mercator: A scalable, extensible Web crawler", WWW 1999, §URL frontier
politeness/trap notes) is template collapse: strip the digit runs out of
every path and compare how many *templates* a host has against how many
*URLs* it emits.  A host with 10^6 URLs but 3 templates is a trap; its
frontier budget should be capped near the template count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/]+)"
_SCHEME_HOST_RE = r"^[a-z][a-z0-9+.-]*://[^/]*"


def url_template_stats(ds, url_col: str = "url", num_groups: int = 64):
    """Per-host URL-template statistics: ``n_urls`` (rows seen),
    ``n_templates`` (distinct paths after every digit run collapses to
    'N'), and ``trap_score = n_urls / n_templates`` — the crawl-budget
    signal (high score = generated URL space, cap the host's frontier).

    Shape (100-TB path): the map stage extracts (host, template) and
    pre-aggregates per batch (one pandas groupby → distinct pairs with
    counts), so the wire carries the batch's *template vocabulary*, not
    its rows; ONE coarse host-hash shuffle; per-group vectorized combine
    (sum partial counts per pair, then distinct-template and URL counts
    per host).  Hosts are never per-key groups — num_groups vectorized
    buckets, same discipline as the rest of the repo.
    """
    from .joins import _key_hash64

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t.column(url_col).to_pylist(), dtype="object").fillna("")
        host = s.str.extract(_HOST_RE, expand=False).fillna("")
        tmpl = s.str.replace(_SCHEME_HOST_RE, "", regex=True).str.replace(
            r"[0-9]+", "N", regex=True
        )
        g = (
            pd.DataFrame({"host": host, "tmpl": tmpl})
            .groupby(["host", "tmpl"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        gk = (
            (_key_hash64(g["host"].to_numpy()) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(33)
        ) % np.uint64(num_groups)
        return pa.table(
            {
                "gk": pa.array(gk.astype(np.int32), pa.int32()),
                "host": pa.array(g["host"], pa.string()),
                "tmpl": pa.array(g["tmpl"], pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy(np.int64), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field("host", pa.string()),
            pa.field("n_urls", pa.int64()),
            pa.field("n_templates", pa.int64()),
            pa.field("trap_score", pa.float64()),
        ]
    )

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (
            t.select(["host", "tmpl", "cnt"])
            .to_pandas()
            .groupby(["host", "tmpl"], sort=True)["cnt"]
            .sum()
            .reset_index()
        )
        per = df.groupby("host", sort=True).agg(
            n_urls=("cnt", "sum"), n_templates=("tmpl", "size")
        )
        n_urls = per["n_urls"].to_numpy(np.int64)
        n_tmpl = per["n_templates"].to_numpy(np.int64)
        return pa.table(
            {
                "host": pa.array(per.index.to_numpy(), pa.string()),
                "n_urls": pa.array(n_urls, pa.int64()),
                "n_templates": pa.array(n_tmpl, pa.int64()),
                "trap_score": pa.array(n_urls / n_tmpl, pa.float64()),
            }
        )

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    return tagged.groupby("gk").map_groups(combine, batch_format="pyarrow")
