"""URL canonicalization for web-crawl curation — pure Column exprs.

Web-scale pipelines (CCNet, RefinedWeb) dedup first by CANONICAL URL
before any content hashing: the same page is crawled under scheme /
case / tracking-parameter / fragment variants, and collapsing those is
a map-side string rewrite, a thousand times cheaper than MinHash on
the bodies. Everything here is built from ``try_parse_url`` + array HOFs,
so it runs in whole-stage codegen with zero shuffles and composes with
the exact-dedup hash aggregate (``operators/dedup.exact_dedup``) and
the per-domain caps in ``operators/sampling``.

Reference parity note: tteofili/certa has no URL operators — this is
training-data-pipeline extension surface, green-field.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query parameters that identify a CLICK, not a page: the standard
# strip-list of web dedup pipelines
_TRACKING_RE = (
    r"^(utm_[a-z]+|fbclid|gclid|dclid|msclkid|mc_cid|mc_eid|ref|ref_src"
    r"|igshid|si|spm|yclid|_ga|s_kwcid)="
)


def _host(col: Column) -> Column:
    h = F.lower(F.try_parse_url(col, F.lit("HOST")))
    return F.regexp_replace(h, r"^www\.", "")


def normalize_url(col: Column) -> Column:
    """Canonical form of a URL: lowercase host without ``www.``,
    default-port (http:80 / https:443) and fragment dropped — a
    NON-default explicit port is kept (``host:8080/x`` and ``host/x``
    are different pages), path with its trailing slash trimmed (bare
    host renders as ``/``), tracking parameters removed and the
    surviving query parameters SORTED (param order is not page
    identity). Scheme is dropped entirely — http/https variants of one
    page are one page. Null-safe: unparseable input yields null, so a
    downstream dedup never groups garbage together."""
    host = _host(col)
    # parse_url HOST excludes the port — recover it from AUTHORITY and
    # keep it unless it is the scheme's default
    auth = F.try_parse_url(col, F.lit("AUTHORITY"))
    port = F.regexp_extract(F.coalesce(auth, F.lit("")), r":(\d+)$", 1)
    proto = F.lower(F.try_parse_url(col, F.lit("PROTOCOL")))
    is_default = ((proto == "http") & (port == "80")) | (
        (proto == "https") & (port == "443")
    )
    host = F.when(
        (port != "") & ~is_default, F.concat(host, F.lit(":"), port)
    ).otherwise(host)
    path = F.coalesce(F.try_parse_url(col, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.try_parse_url(col, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qstr = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        host.isNotNull(), F.concat(host, path, qstr)
    )


# two-level public suffixes common enough to matter for grouping; a
# full public-suffix list is a data file a production deploy would
# broadcast-join instead (documented seam, same expression shape)
_TWO_LEVEL_TLDS = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.ar", "com.tr", "co.za", "com.sg",
)


def registrable_domain(col: Column) -> Column:
    """The registrable domain of a URL (``news.bbc.co.uk`` ->
    ``bbc.co.uk``, ``a.b.example.com`` -> ``example.com``) — the
    grouping key for per-domain crawl caps and domain-level quality
    priors. Last two host labels, or three when the last two form a
    known two-level public suffix."""
    host = _host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    # try_element_at: single-label hosts (localhost) have no -2 index
    # and must not throw under ANSI mode
    last2 = F.concat_ws(
        ".",
        F.try_element_at(parts, F.lit(-2)),
        F.try_element_at(parts, F.lit(-1)),
    )
    is2l = last2.isin(*_TWO_LEVEL_TLDS)
    take = F.when(is2l & (n >= 3), F.lit(3)).otherwise(
        F.least(n, F.lit(2))
    )
    return F.when(
        host.isNotNull(),
        F.array_join(F.slice(parts, n - take + 1, take), "."),
    )
