"""URL/domain canonicalization and URL-level deduplication.

The first stage of every web-curation recipe (RefinedWeb §3.1 "URL
deduplication", Dolma's URL dedup pass, CCNet's per-snapshot URL
filter): before any content-based dedup, collapse records that are
the SAME RESOURCE fetched under cosmetically different URLs —
http vs https, ``www.`` or not, default ports, trailing slashes,
tracking query parameters, fragments, query-parameter order.

Everything here is pure ``pyspark.sql.functions`` column algebra —
string/regex/array built-ins inside whole-stage codegen, no UDF, no
shuffle for canonicalization itself; :func:`dedup_by_url` adds the
single map-side-combinable aggregate.  A 100-TB crawl canonicalizes
at scan speed and shuffles only (canonical_url → tiny group row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that never identify a resource: analytics /
# click-tracking channels.  The standard blocklists (RefinedWeb,
# common crawler hygiene) all start with the utm_* family.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "utm_id", "gclid", "fbclid", "msclkid",
    "mc_cid", "mc_eid", "ref", "referrer", "igshid",
)


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL as a single codegen-friendly column
    expression — the equivalence key of URL-level dedup.

    Normalizations applied (each one a real-world alias class):

    * scheme dropped (``http://`` ≡ ``https://`` ≡ missing);
    * host lowercased; one leading ``www.`` stripped; default ports
      ``:80`` / ``:443`` stripped;
    * path: trailing slashes stripped (``/a/`` ≡ ``/a``; the empty
      path ≡ ``/``), case preserved (paths ARE case-sensitive);
    * fragment (``#…``) dropped — never sent to the server;
    * query: split on ``&``, tracking parameters
      (:data:`TRACKING_PARAMS`, matched on the name before ``=``,
      case-insensitive) and empty pairs dropped, the survivors
      SORTED so parameter order doesn't matter, re-joined; an
      emptied query drops its ``?``.

    NOT applied (documented non-goals, same choices as the public
    recipes): no IDN/punycode mapping, no percent-decoding (both can
    change identity), no userinfo stripping (``user@host`` is rare
    and ambiguous in crawls), no registered-domain extraction (that
    is :func:`domain_of`, which needs a public-suffix list to be
    exact — see its docstring).

    Returns ``host + path [+ '?' + query]`` — e.g.
    ``HTTPS://WWW.News.Example.COM:443/a/b/?id=7&utm_source=x#top``
    → ``news.example.com/a/b?id=7``.
    """
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    u = F.substring_index(u, "#", 1)                       # drop fragment
    u = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")  # drop scheme
    hostpath = F.substring_index(u, "?", 1)
    # group 1 of each extract is "" when the pattern doesn't match —
    # exactly the wanted default for a missing query/path
    rawq = F.regexp_extract(u, r"\?(.*)$", 1)
    host = F.lower(F.substring_index(hostpath, "/", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(hostpath, r"^[^/]*(/.*)$", 1)
    path = F.regexp_replace(path, r"/+$", "")
    blocked = F.array(*[F.lit(p) for p in TRACKING_PARAMS])
    pairs = F.filter(
        F.split(rawq, "&"),
        lambda kv: (kv != "")
        & ~F.array_contains(blocked, F.lower(F.substring_index(kv, "=", 1))),
    )
    query = F.array_join(F.array_sort(pairs), "&")
    return F.concat(
        host, path, F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit(""))
    )


def domain_of(url: Column | str) -> Column:
    """The canonical HOST of a URL (lowercased, ``www.``/default-port
    stripped) — the grouping key of per-domain quotas, blocklists and
    crawl-politeness stats.  NOTE: this is the full host, not the
    registered domain; exact registrable-domain extraction needs a
    public-suffix list (out of scope here, same boundary as the
    multimodal codecs)."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    u = F.substring_index(u, "#", 1)
    u = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.substring_index(F.substring_index(u, "?", 1), "/", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":(80|443)$", "")


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level dedup groups: one row per canonical URL with the
    lowest-id member as the canonical document and the group size —
    RefinedWeb's first dedup stage, run BEFORE any content fetch or
    text dedup because it needs nothing but the URL string.

    Returns ``(canonical_url, canonical_doc_id, n_dups)`` where
    ``n_dups`` counts the OTHER members (0 = the URL is unique).

    Scale shape: canonicalization is a codegen projection on the
    scan; the only exchange is the (canonical_url)-keyed aggregate,
    and MIN/COUNT are map-side combinable, so a hot URL (a crawl that
    fetched one page a million times) partial-aggregates before the
    shuffle.  Output is group-level (one row per distinct resource),
    orders of magnitude smaller than the input at web scale.
    """
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_dups"),
        )
    )
