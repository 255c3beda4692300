"""URL parsing and per-host/domain statistics — the web-corpus
curation primitives (domain blocklists, per-domain document caps,
host-level quality priors) every CommonCrawl-style pipeline runs
before anything else touches the text.

Scale shape:
  * ``parse_urls`` is ONE vectorized RE2 pass (`pc.extract_regex`) —
    no Python row loop, no urllib per-row object churn; the regex is
    anchored and linear-time (RE2), so adversarial URLs cannot blow
    up a worker.
  * ``host_stats`` pre-aggregates per block (one row per distinct
    host per block enters the exchange — the Zipf-head bound from
    ``ops.vocab``) before a small groupby.
  * ``cap_per_domain`` composes the parse with
    ``ops.rank.top_k_per_key``'s skew-safe partial-top-k combiner, so
    a crawl where one domain contributes 10⁹ pages still ships at
    most k rows per domain per block.

The regex mirrors RFC-3986's first-cut split (scheme://authority path
?query) without percent-decoding; the registrable domain is the last
two dot-labels of the port-stripped host — the public-suffix-list
refinement is a data swap, not a code change (documented seam).

DuckDB's regexp functions are RE2 as well, so a SQL oracle using the
same pattern and group indexes is bit-equal on every field
(``__ray_entry__.url_host_stats``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

URL_RE = (r'^(?P<scheme>[a-z][a-z0-9+.\-]*)://(?P<host>[^/?#]+)'
          r'(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?')


def _field(struct, name: str):
    col = pc.struct_field(struct, name)
    return pc.fill_null(col, "")


def parse_urls(ds, url_col: str = "url", prefix: str = "url_"):
    """Append ``{prefix}scheme/host/domain/path/query`` string columns
    parsed from ``url_col``. Unparseable rows get '' everywhere
    (matching SQL ``regexp_extract``'s no-match value). ``domain`` is
    the registrable domain: port-stripped host, last two labels."""

    def parse(t: pa.Table) -> pa.Table:
        s = pc.extract_regex(t.column(url_col), URL_RE)
        host = _field(s, "host")
        # port strip + last-two-labels, vectorized via Arrow kernels:
        # domain = the substring after the second-to-last '.' of the
        # port-stripped host ('' stays '')
        bare = pc.replace_substring_regex(host, r':[0-9]*$', "")
        domain = pc.extract_regex(bare, r'(?P<d>[^.]+\.[^.]+)$')
        domain = pc.fill_null(pc.struct_field(domain, "d"), "")
        # single-label hosts (no dot) are their own registrable domain
        domain = pc.if_else(pc.equal(domain, ""), bare, domain)
        for name, col in (("scheme", _field(s, "scheme")),
                          ("host", host), ("domain", domain),
                          ("path", _field(s, "path")),
                          ("query", _field(s, "query"))):
            t = t.append_column(prefix + name, col)
        return t

    return ds.map_batches(parse, batch_format="pyarrow")


def host_stats(ds, url_col: str = "url") -> pd.DataFrame:
    """-> (host, n_docs, n_paths) per distinct host: document count
    and distinct-path count. Per-block pre-aggregation bounds the
    exchange at one row per (host, path) per block for the distinct
    side and one per host for the count side."""
    parsed = parse_urls(ds, url_col)

    def pre(t: pa.Table) -> pa.Table:
        df = t.select(["url_host", "url_path"]).to_pandas()
        out = (df.drop_duplicates()
               .rename(columns={"url_host": "host", "url_path": "path"}))
        counts = (df.groupby("url_host", sort=False).size()
                  .rename("n").reset_index()
                  .rename(columns={"url_host": "host"}))
        out = out.merge(counts, on="host", how="left")
        # n is only meaningful on one row per host per block; zero the
        # duplicates so the fold is a plain sum
        first = ~out["host"].duplicated()
        out.loc[~first, "n"] = 0
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = parsed.map_batches(pre, batch_format="pyarrow").to_pandas()
    n_docs = parts.groupby("host", as_index=False)["n"].sum()
    n_paths = (parts[["host", "path"]].drop_duplicates()
               .groupby("host", as_index=False).size()
               .rename(columns={"size": "n_paths"}))
    out = n_docs.merge(n_paths, on="host")
    out["n"] = out["n"].astype(np.int64)
    out["n_paths"] = out["n_paths"].astype(np.int64)
    return out.rename(columns={"n": "n_docs"}).sort_values(
        "host").reset_index(drop=True)


def cap_per_domain(ds, url_col: str, id_col: str, k: int,
                   quality_col: str | None = None):
    """Keep at most ``k`` documents per registrable domain — by
    ``quality_col`` descending when given, else the deterministic
    smallest-``id_col`` order — via the skew-safe per-block top-k
    combiner (``ops.rank``)."""
    from raykg.ops.rank import top_k_per_key

    parsed = parse_urls(ds, url_col)
    if quality_col is None:
        # order by id asc: top_k_per_key needs distinct (val, id)
        # labels, so mirror the id into a throwaway order column
        def mirror(t: pa.Table) -> pa.Table:
            return t.append_column("_cap_ord", t.column(id_col))

        parsed = parsed.map_batches(mirror, batch_format="pyarrow")
        out = top_k_per_key(parsed, "url_domain", "_cap_ord", id_col, k=k,
                            val_ascending=True)
        return out.drop_columns(["_cap_ord"])
    return top_k_per_key(parsed, "url_domain", quality_col, id_col, k=k)
