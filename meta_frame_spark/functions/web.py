"""Web/URL functions for web-corpus curation.

URL canonicalization is the prerequisite of URL-keyed dedup: crawls
see the same page as ``HTTP://Example.com:80/a?utm_source=x&b=1#frag``
and ``http://example.com/a?b=1`` — canonicalize first or URL dedup
undercounts.

Everything is built-in string/array expressions (codegen'd JVM, no
UDF) and engine-portable: DuckDB spells the same pipeline with
``regexp_extract`` / ``list_filter`` / ``list_sort`` /
``array_to_string``.

Reference parity note: the reference (`skybluecycology/meta_frame`)
has no string functions at all; north-star web-curation scope.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_url(url: str | Column) -> Column:
    """Canonical form of an http(s) URL:

    - scheme and host lowercased (path/query case preserved);
    - explicit default ports ``:80``/``:443`` dropped;
    - fragment (``#...``) dropped;
    - tracking params (``utm_*``) dropped;
    - remaining query params sorted byte-wise, rejoined with ``&``
      (empty query drops the ``?``).

    Null-safe; non-URL strings pass through mostly unchanged (the
    regexes simply don't match). Order of operations matters: the
    fragment is cut before the query split so ``?a=1#f`` parses as
    param ``a=1``.
    """
    u = F.col(url) if isinstance(url, str) else url
    # 1. drop fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme://host[:port] (first path char onward untouched)
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1))
    tail = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", "")
    u = F.when(head == "", u).otherwise(F.concat(head, tail))
    # 3. drop explicit default ports (capture the follower rather than
    # look ahead — RE2 engines like DuckDB's have no lookahead)
    u = F.regexp_replace(u, r"^(https?://[^/?:]*):(?:80|443)([/?]|$)", r"$1$2")
    # 4. split off query, filter utm_*, sort, rejoin
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.when(query == "", base).otherwise(
        F.when(sorted_q == "", base).otherwise(F.concat(base, F.lit("?"), sorted_q))
    )


def url_host(url: str | Column) -> Column:
    """Lowercased host (no port) of an http(s) URL — the per-domain
    grouping key for quotas/caps; null when no ``://`` present."""
    u = F.col(url) if isinstance(url, str) else url
    h = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?:#]*)", 1))
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)
