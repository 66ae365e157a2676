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

from pyspark.sql import Column, DataFrame
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


#: RE2-portable scheme://host prefix; group 1 captures the path
_URL_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
#: session-id parameter names (case-insensitive, anchored to a
#: parameter boundary) — the classic crawler-trap tell. The ';'
#: alternation catches the servlet path form (/page;jsessionid=abc)
#: and ;-delimited query params, scanned over path + query together.
_SESSION_RE = r"(^|&|;)(sid|sessionid|session_id|phpsessid|jsessionid)="


def with_url_quality(
    df,
    url_col: str = "url",
    max_len: int = 2048,
    max_params: int = 8,
    max_depth: int = 12,
):
    """Append the URL-tier quality flags every web pipeline applies
    BEFORE fetching or keeping a page (CCNet/RefinedWeb run a URL
    filter ahead of all content tiers — a crawler-trap URL predicts
    junk content and infinite crawl spaces):

    * ``url_len``      — total length;
    * ``n_params``     — query parameters (non-empty ``&`` pieces);
    * ``path_depth``   — non-empty ``/`` segments of the path;
    * ``has_session_id`` — sid/sessionid/phpsessid/jsessionid
      parameter (case-insensitive);
    * ``is_calendar_trap`` — three or more CONSECUTIVE all-numeric
      path segments (``/2005/03/17/`` archives and their infinite
      neighbors);
    * ``url_pass``     — within all limits and no trap tells.

    Pure codegen string/array expressions over frozen, RE2-portable
    regexes — map-only, no Python, stream-safe; the DuckDB oracle
    replays every count and flag byte-exactly. Null URL -> null row.
    """
    c = F.col(url_col)
    frag_free = F.split_part(c, F.lit("#"), F.lit(1))
    # everything after the FIRST '?' (regexp_extract: both engines
    # return '' on no match — no conditional needed)
    query = F.regexp_extract(frag_free, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"), lambda p: F.length(p) > 0
    )
    path = F.regexp_extract(frag_free, _URL_PATH_RE, 1)
    segs = F.filter(F.split(path, "/"), lambda s: F.length(s) > 0)
    numeric_mask = F.array_join(
        F.transform(
            segs,
            lambda s: F.when(s.rlike(r"^[0-9]+$"), F.lit("1"))
            .otherwise(F.lit("0")),
        ),
        "",
    )
    n_params = F.size(params)
    depth = F.size(segs)
    # scan path AND query: servlet URLs embed ;jsessionid= in the path
    has_sess = F.lower(F.concat_ws("&", path, query)).rlike(_SESSION_RE)
    trap = numeric_mask.contains("111")
    ok = (
        (F.length(c) <= max_len)
        & (n_params <= max_params)
        & (depth <= max_depth)
        & ~has_sess
        & ~trap
    )
    return df.select(
        "*",
        F.when(c.isNotNull(), F.length(c)).alias("url_len"),
        F.when(c.isNotNull(), n_params).alias("n_params"),
        F.when(c.isNotNull(), depth).alias("path_depth"),
        F.when(c.isNotNull(), has_sess).alias("has_session_id"),
        F.when(c.isNotNull(), trap).alias("is_calendar_trap"),
        F.when(c.isNotNull(), ok).alias("url_pass"),
    )


# ---------------------------------------------------------------------------
# HTML boilerplate extraction (jusText / trafilatura-class heuristics)
# ---------------------------------------------------------------------------

#: block-level boundaries become line breaks BEFORE tag stripping, so
#: the line is the classification unit (jusText's "block"); inline
#: tags (<a>, <b>, <span>...) stay inside their line.
_BLOCK_BREAK_RE = (
    r"(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|/section"
    r"|/article|/header|/footer|/blockquote|/pre|/td)[^>]*>"
)
_LINK_TEXT_RE = r"(?is)<a[^>]*>(.*?)</a>"
_TAG_RE = r"(?s)<[^>]*>"


def _clean_fragment(c: Column) -> Column:
    """Strip remaining (inline) tags, decode the frozen entity set
    (:data:`meta_frame_spark.functions.text.HTML_ENTITIES` — ONE
    shared table, so this chain and strip_html can never drift from
    each other or from their oracle mirrors), collapse whitespace."""
    from meta_frame_spark.functions.text import HTML_ENTITIES

    c = F.regexp_replace(c, _TAG_RE, " ")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_to_text(
    html: str | Column,
    min_chars: int = 25,
    max_link_density: float = 0.35,
) -> Column:
    """Main-content text of an HTML document — the boilerplate-removal
    step a web pipeline needs BEFORE C4/Gopher quality gates (public
    jusText [Pomikálek 2011] / trafilatura-class heuristics, frozen
    thresholds):

    1. comments and ``<script>``/``<style>`` blocks drop wholesale;
    2. block-level tag boundaries become line breaks, making the LINE
       the classification unit;
    3. per line, link density = chars of ``<a>...</a>`` text over all
       visible chars (computed BEFORE inline-tag stripping);
    4. a line survives iff it has ``>= min_chars`` visible chars AND
       link density ``<= max_link_density`` — nav bars, footers, and
       button rows are short and link-saturated, body prose is
       neither (jusText's core observation);
    5. survivors join with ``\\n``.

    Pure codegen expression — map-only, stream-safe, no UDF — and
    engine-portable: DuckDB spells the identical chain with
    ``regexp_replace(..., 'g')`` / ``list_filter`` /
    ``list_transform``, so an oracle can replay it byte-exactly.
    (Known engine edge: Java ``\\s`` includes VT ``\\x0b``, RE2's does
    not — irrelevant to real HTML.) NULL html -> NULL."""
    if min_chars < 1:
        raise ValueError(f"min_chars must be >= 1, got {min_chars}")
    if not 0.0 <= max_link_density <= 1.0:
        raise ValueError(
            f"max_link_density must be in [0, 1], got {max_link_density}"
        )
    h = F.col(html) if isinstance(html, str) else html
    h = F.regexp_replace(h, r"(?is)<!--.*?-->", " ")
    h = F.regexp_replace(h, r"(?is)<script[^>]*>.*?</script>", " ")
    h = F.regexp_replace(h, r"(?is)<style[^>]*>.*?</style>", " ")
    h = F.regexp_replace(h, _BLOCK_BREAK_RE, "\n")
    lines = F.split(h, r"\n")

    def _entry(line: Column) -> Column:
        link_text = _clean_fragment(
            F.array_join(
                F.regexp_extract_all(line, F.lit(_LINK_TEXT_RE), F.lit(1)),
                " ",
            )
        )
        return F.struct(
            _clean_fragment(line).alias("clean"),
            F.length(link_text).alias("link_chars"),
        )

    kept = F.filter(
        F.transform(lines, _entry),
        lambda e: (F.length(e["clean"]) >= F.lit(int(min_chars)))
        & (
            e["link_chars"].cast("double")
            / F.greatest(F.length(e["clean"]), F.lit(1)).cast("double")
            <= F.lit(float(max_link_density))
        ),
    )
    return F.array_join(F.transform(kept, lambda e: e["clean"]), "\n")


def with_html_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    min_chars: int = 25,
    max_link_density: float = 0.35,
) -> DataFrame:
    """DataFrame form of :func:`html_to_text` (the ``with_c4_clean``
    shape): adds ``out_col`` with the extracted main-content text.
    Map-only; registered as the ``html_extract`` curation step so a
    config pipeline can run crawl HTML -> boilerplate removal ->
    c4_gate/gopher gates in one declared chain."""
    if out_col in df.columns:
        raise ValueError(
            f"with_html_text: out_col {out_col!r} collides with an "
            f"input column"
        )
    return df.withColumn(
        out_col, html_to_text(html_col, min_chars, max_link_density)
    )


#: href + anchor of an <a> element. Lazy body match; double-quoted
#: href only (the overwhelmingly dominant form; unquoted/single-quoted
#: hrefs are link-farm noise a crawl pipeline is happy to skip).
_A_HREF_RE = r'(?is)<a[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def html_links(html: str | Column) -> Column:
    """All hyperlinks of an HTML document as
    ``array<struct<href:string, anchor:string>>`` — the crawl-graph /
    anchor-text primitive (anchor text is a classic relevance and
    quality signal: TREC anchor-text runs, and the link graph feeds
    PageRank-family domain scores).

    Comments and ``<script>``/``<style>`` blocks are dropped FIRST so
    commented-out or scripted markup never contributes links; anchors
    are cleaned with the same inline-tag strip + frozen entity decode
    + whitespace collapse as :func:`html_to_text`
    (``_clean_fragment``), so ``<a href=x><b>Hi</b> &amp; bye</a>``
    yields anchor ``'Hi & bye'``.

    Pure codegen expression (two ``regexp_extract_all`` passes zipped
    positionally — both engines return matches in document order), 
    map-only, stream-safe; DuckDB replays it with the same pattern
    and group indexes. NULL html -> NULL."""
    h = F.col(html) if isinstance(html, str) else html
    h = F.regexp_replace(h, r"(?is)<!--.*?-->", " ")
    h = F.regexp_replace(h, r"(?is)<script[^>]*>.*?</script>", " ")
    h = F.regexp_replace(h, r"(?is)<style[^>]*>.*?</style>", " ")
    hrefs = F.regexp_extract_all(h, F.lit(_A_HREF_RE), F.lit(1))
    anchors = F.regexp_extract_all(h, F.lit(_A_HREF_RE), F.lit(2))
    return F.zip_with(
        hrefs,
        anchors,
        lambda u, a: F.struct(
            u.alias("href"), _clean_fragment(a).alias("anchor")
        ),
    )


def with_html_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exploded link table: one row per ``<a href>`` occurrence —
    ``(id_col, link_rank, href, anchor, is_absolute)``, document
    order preserved (``link_rank`` from ``posexplode``).
    ``is_absolute`` marks scheme-qualified targets (``http(s)://``) —
    the cheap internal/external split before host resolution
    (``url_host`` / ``canonical_url`` compose downstream). Map-only:
    explode multiplies rows but shuffles nothing."""
    pruned = df.select(F.col(id_col), html_links(html_col).alias("_links"))
    return pruned.select(
        id_col,
        F.posexplode("_links").alias("_pos", "_l"),
    ).select(
        id_col,
        (F.col("_pos") + 1).alias("link_rank"),
        F.col("_l.href").alias("href"),
        F.col("_l.anchor").alias("anchor"),
        F.col("_l.href").rlike("^https?://").alias("is_absolute"),
    )


def robots_disallows(txt: str | Column) -> Column:
    """Disallow path-prefixes that apply to the wildcard user-agent
    (``User-agent: *``) of a robots.txt body — the crawl-politeness
    primitive (public REP spec, RFC 9309): a fetcher must skip URLs
    whose path starts with any of these prefixes.

    Parsing (pure codegen HOFs, no UDF): comments strip at ``#``,
    lines trim, directive names match case-insensitively; a
    ``Disallow`` belongs to the group opened by the most recent
    ``User-agent`` line (each UA line starts its own group here — the
    documented simplification vs RFC 9309 §2.2.1's multi-UA groups:
    a ``Disallow`` following ``User-agent: *`` directly is always
    honored, which is the overwhelmingly dominant layout); empty
    ``Disallow:`` values (allow-all) are dropped. Group tracking uses
    a prefix-count of UA lines per index — O(n^2) per file, and
    robots bodies are tens of lines, so this stays trivially cheap
    while remaining a pure expression both engines can run.

    NULL/empty input -> empty list (nothing disallowed)."""
    t = F.col(txt) if isinstance(txt, str) else txt
    lines = F.transform(
        F.split(F.coalesce(t, F.lit("")), r"\n"),
        lambda l: F.trim(F.regexp_replace(l, r"#.*$", "")),
    )
    n = F.size(lines)
    idx = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )

    def ua_count_at(i):
        # UA lines among lines[1..i] — the group id of line i
        return F.size(
            F.filter(
                F.slice(lines, F.lit(1), i),
                lambda l: F.lower(l).rlike(r"^user-agent\s*:"),
            )
        )

    star_groups = F.transform(
        F.filter(
            idx,
            lambda i: F.lower(F.element_at(lines, i)).rlike(
                r"^user-agent\s*:\s*\*\s*$"
            ),
        ),
        ua_count_at,
    )
    return F.transform(
        F.filter(
            idx,
            lambda i: F.lower(F.element_at(lines, i)).rlike(
                r"^disallow\s*:\s*\S"
            )
            & F.array_contains(star_groups, ua_count_at(i)),
        ),
        lambda i: F.trim(
            F.regexp_replace(
                F.element_at(lines, i), r"(?i)^disallow\s*:", ""
            )
        ),
    )


def apply_robots(
    df: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Drop rows whose URL path is disallowed for ``User-agent: *``
    by that host's robots.txt. ``robots`` carries one row per host
    (``host_col``, ``txt_col``); hosts absent from it allow
    everything (the REP default when no robots.txt exists).

    Scale: the rules side is HOST-count-sized (a crawl of the whole
    web has ~10^8 hosts; any per-bucket slice is far smaller), so it
    parses once and broadcast-joins against the corpus on the url
    host — the fact table never shuffles. Prefix checks are a
    codegen ``exists`` over the parsed list."""
    rules = robots.select(
        F.col(host_col).alias("_rb_host"),
        robots_disallows(F.col(txt_col)).alias("_rb_prefixes"),
    )
    path = F.regexp_extract(F.col(url_col), _URL_PATH_RE, 1)
    out = df.join(
        F.broadcast(rules),
        url_host(F.col(url_col)) == F.col("_rb_host"),
        "left",
    )
    blocked = F.exists(
        F.coalesce(
            F.col("_rb_prefixes"), F.array().cast("array<string>")
        ),
        lambda p: path.startswith(p),
    )
    return out.filter(~blocked).drop("_rb_host", "_rb_prefixes")
