"""URL canonicalization for web-crawl corpora (engine extension; no
reference counterpart — the reference ingests pre-extracted per-document
files, but a Common-Crawl-scale pipeline dedups by canonical URL before
anything else touches the bytes).

Canonical form (documented; the DuckDB oracle reproduces it with an
independent regexp decomposition):

  * scheme and authority lower-cased;
  * default ports stripped (``:80``/``:443``); other explicit ports kept
    (``host:8080`` is a different origin, conflating it would merge
    distinct documents);
  * fragment dropped (never sent to the server);
  * empty path normalized to ``/``;
  * tracking query parameters removed (``utm_*``, ``fbclid``,
    ``gclid``) and the surviving parameters SORTED, so a reshuffled
    tracking link reaches the same canonical key.

Everything is built-in expressions (``parse_url`` runs JVM-side inside
whole-stage codegen) — no Python in the path, so canonicalizing 10^12
urls is a map-only scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="


def _part(u: Column, part: str) -> Column:
    return F.parse_url(u, F.lit(part))


def canonical_host(url) -> Column:
    """Lower-cased authority with default ports stripped."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(F.lower(_part(u, "AUTHORITY")), ":(80|443)$", "")


def canonical_url(url) -> Column:
    """Canonical form of a URL column (see module docstring)."""
    u = F.col(url) if isinstance(url, str) else url
    proto = F.lower(_part(u, "PROTOCOL"))
    host = canonical_host(u)
    path = F.coalesce(_part(u, "PATH"), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.coalesce(_part(u, "QUERY"), F.lit(""))
    kept = F.filter(F.split(query, "&"),
                    lambda p: (p != "") & ~p.rlike(_TRACKING_RE))
    q = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        proto, F.lit("://"), host, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canon_url`` and ``host`` columns — map-only, codegen'd."""
    return df.withColumn("canon_url", canonical_url(url_col)) \
             .withColumn("host", canonical_host(url_col))


def dedup_by_canonical(df: DataFrame, id_col: str = "doc_id",
                       url_col: str = "url") -> DataFrame:
    """One representative row (min id) per canonical URL: the crawl-side
    twin of ``dedup.collapse_exact_docs`` — one hash-keyed shuffle on the
    canonical string, group-shaped output."""
    canon = canonicalize_urls(df, url_col)
    keep = (canon.groupBy("canon_url")
            .agg(F.min(id_col).alias(id_col)).select(id_col))
    return canon.join(keep, id_col)
