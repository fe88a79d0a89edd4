"""URL canonicalization and host extraction for web-corpus dedup.

Crawled corpora dedup first on the *canonical* URL: scheme and host
lowercased, default ports dropped, tracking parameters (utm_*, fbclid,
gclid, ref) removed, fragment removed, root trailing slash normalized.

The canonical form is COMPOSED from extracted parts (scheme, host:port,
path+query) instead of one replacement chain, because Java regex and RE2
disagree on group-replacement syntax ($1 vs \\1): every regexp_replace
here has a group-FREE replacement, and every group usage is in
regexp_extract — the exact same pattern strings run on Spark and on the
DuckDB oracle.  All codegen string expressions: a canonicalization pass
over 100 TB is one shuffle-free scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared verbatim with the SQL oracle (queries/pipeline.py).
SCHEME_PAT = r"^([a-zA-Z]+)://"
HOSTPORT_PAT = r"^[a-zA-Z]+://(?:[^@/?#]*@)?([^/?#]*)"
PATH_PAT = r"^[a-zA-Z]+://[^/?#]*([^?#]*)"
QUERY_PAT = r"\?([^#]*)"
TRACKING_PARAM_PAT = r"^(utm_[a-z]+|fbclid|gclid|ref)="


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL column — all codegen string expressions.

    Tracking parameters are removed by splitting the query string on '&'
    and filtering, NOT by a replacement chain: replacement can't repair a
    leading '?utm_x=1&real=2' (the '?' goes with the stripped param), and
    param-level filtering mirrors exactly into the oracle's
    list_filter."""
    scheme = F.lower(F.regexp_extract(url, SCHEME_PAT, 1))
    hostport = F.lower(F.regexp_extract(url, HOSTPORT_PAT, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(url, PATH_PAT, 1)
    path = F.regexp_replace(path, r"^/$", "")  # root slash
    query = F.regexp_extract(url, QUERY_PAT, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PAT),
    )
    canon_query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, canon_query)


def url_host(url: Column) -> Column:
    """Lowercased host (no port, no credentials)."""
    hostport = F.lower(F.regexp_extract(url, HOSTPORT_PAT, 1))
    return F.regexp_replace(hostport, r":[0-9]+$", "")


def registered_domain(url: Column) -> Column:
    """Last two host labels — the eTLD+1 approximation that needs no
    suffix list (documented approximation, not a full PSL lookup)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One surviving row per canonical URL: (canon_url, survivor_id,
    dup_cnt) — a single hash-aggregate shuffle on the canonical key."""
    return (
        df.select(canonical_url(F.col(url_col)).alias("canon_url"), F.col(id_col))
        .groupBy("canon_url")
        .agg(F.min(id_col).alias("survivor_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )
