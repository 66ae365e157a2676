"""Text-analysis functions for training-data pipelines (SURVEY.md §7.1
step 6a; no equivalent in the reference).

All pure ``pyspark.sql.functions`` column expressions — JVM-side,
whole-stage codegen, zero Python in the row path. Each helper returns
either a Column (composable) or a DataFrame with columns appended.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Minimal per-language stopword lists for the heuristic language ID.
#: Deliberately tiny and deterministic — this is an n-gram/stopword
#: heuristic, not a model (container has no langid libs).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "nicht"],
    "es": ["el", "la", "los", "las", "de", "y", "es", "un", "una", "que"],
}


def tokens(text: str | Column) -> Column:
    """Whitespace tokens (array<string>), empty-safe."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(r"\S+"), 0)


def token_count(text: str | Column) -> Column:
    """Whitespace token count (int) — codegen, no UDF."""
    return F.size(tokens(text))


#: GPT-2-style pre-tokenizer regex, simplified to the subset that is
#: portable between Java regex (Spark) and RE2 (DuckDB oracle): a run
#: of letters, a run of digits, or a run of other non-space symbols,
#: each optionally preceded by one space. Counting these is the
#: standard cheap token-budget estimate for LLM corpus accounting.
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_tokens(text: str | Column) -> Column:
    """BPE-ish pre-tokens (array<string>) via :data:`BPE_TOKEN_RE`."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)


def bpe_token_count(text: str | Column) -> Column:
    """BPE-ish pre-token count (int) — the training-cost proxy."""
    return F.size(bpe_tokens(text))


def char_count(text: str | Column) -> Column:
    """Character count (int) — ``length`` on the column."""
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def punct_ratio(text: str | Column) -> Column:
    """Fraction of characters that are punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(c, r"[^.!?,;:'\"()\[\]{}-]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(text: str | Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    words = STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    n = F.size(toks)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(text: str | Column) -> Column:
    """Deterministic heuristic quality score in [0, 1]:
    mean of (length-in-range, has-enough-tokens, not-punct-heavy,
    mean-token-length-in-range). The standard cheap pre-filter shape
    for LLM corpus cleaning (C4/Gopher-style rules)."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c)
    n_chr = F.length(c)
    mean_tok_len = F.when(n_tok > 0, n_chr / n_tok).otherwise(F.lit(0.0))
    rules = [
        F.when((n_chr >= 50) & (n_chr <= 100000), 1.0).otherwise(0.0),
        F.when(n_tok >= 10, 1.0).otherwise(0.0),
        F.when(punct_ratio(c) <= 0.3, 1.0).otherwise(0.0),
        F.when((mean_tok_len >= 2) & (mean_tok_len <= 12), 1.0).otherwise(0.0),
    ]
    total = rules[0]
    for r in rules[1:]:
        total = total + r
    return total / F.lit(float(len(rules)))


def language_id(text: str | Column) -> Column:
    """Heuristic language ID: the language whose stopword list scores the
    most token hits; 'und' (undetermined) when nothing hits. Pure SQL
    expressions so the same logic is expressible in the DuckDB oracle.
    Delegates to :func:`language_scores` (Catalyst simplifies the
    struct-field access away) so the winner/tie rules cannot drift
    between the id and the confidence variants."""
    return language_scores(text)["lang"]


def language_scores(text: str | Column) -> Column:
    """Language ID with confidence: ``struct(lang, hits, margin)`` —
    the winning language (same tie rules as :func:`language_id`), its
    stopword hit count, and the margin over the runner-up. A small
    margin flags code-mixed or too-short text a hard lang gate would
    misroute; filter on ``margin >= k`` for a precision-tuned gate.
    Pure SQL expressions, engine-portable like language_id."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(words)))
        for lang, words in STOPWORDS.items()
    }
    langs = list(scores)
    vals = [scores[lg] for lg in langs]
    best = F.greatest(*vals)
    # runner-up = max over each language of (its score if it is NOT the
    # unique winner). With ties, second == best — margin 0, as it should.
    second = F.sort_array(F.array(*vals), asc=False)[1]
    lang = F.lit("und")
    for lg in reversed(langs):
        lang = F.when((best > 0) & (scores[lg] == best), lg).otherwise(lang)
    return F.struct(
        lang.alias("lang"),
        best.alias("hits"),
        F.when(best > 0, best - second).otherwise(F.lit(0)).alias("margin"),
    )


def rolling_fingerprint(text: str | Column, window: int = 8) -> Column:
    """Document fingerprint: min over a Rabin-Karp rolling hash of
    every ``window``-byte span of the normalized text (winnowing-style
    min-sampling). Deterministic; 8-byte output per doc; null text →
    null.

    Vectorized in an Arrow-batched pandas UDF: the hash of all spans is
    one sliding-window matmul over the byte array (int64 wraparound —
    deterministic two's-complement math). The previous form hashed each
    span with an interpreted per-element ``substr``+``xxhash64`` lambda
    — measured >10× slower and invisible under count()-style probes
    because Catalyst prunes unevaluated projections.
    """
    # fixed odd base powers B^(w-1) ... B^0 (mod 2^64, int64 view)
    base = 1099511628211  # FNV-ish odd multiplier
    powers = np.array(
        [pow(base, window - 1 - j, 1 << 64) for j in range(window)], dtype=np.uint64
    ).astype(np.int64)

    @F.pandas_udf("long")
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            norm = " ".join(t.lower().split())
            b = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8).astype(np.int64)
            if b.size == 0:
                out.append(0)
                continue
            if b.size < window:
                b = np.pad(b, (0, window - b.size))
            spans = np.lib.stride_tricks.sliding_window_view(b, window)
            out.append(int((spans @ powers).min()))
        return pd.Series(out, dtype="object")

    c = F.col(text) if isinstance(text, str) else text
    return _fp(c)


def shingle_fingerprint(text: str | Column, n: int = 4) -> Column:
    """Document fingerprint: min over md5-hashed word ``n``-gram
    shingles (min-sampling, i.e. MinHash with one hash function).
    Token-grain sibling of :func:`rolling_fingerprint` with two extra
    properties: UDF-free — the whole thing is codegen'd JVM
    ``transform``/``md5``/``conv``/``array_min`` — and engine-portable
    (any engine with md5 reproduces it; DuckDB spells the hash
    ``('0x' || substr(md5(g),1,8))::BIGINT``). Docs shorter than ``n``
    tokens → null.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.regexp_extract_all(F.lower(c), F.lit(r"\S+"), 0)
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.when(F.size(toks) >= n, F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )).otherwise(F.array().cast("array<string>"))
    return F.array_min(
        F.transform(
            grams,
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
        )
    )


def normalize_text(text: str | Column) -> Column:
    """Dedup-grade text normalization, all built-in expressions:
    lowercase, collapse whitespace runs to single spaces, trim. The
    canonical pre-step before exact/near dedup so byte-level variants
    of the same content collide. (Unicode NFC needs Python's
    unicodedata — see :func:`normalize_text_unicode`.)"""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def normalize_text_unicode(text: str | Column, form: str = "NFC") -> Column:
    """:func:`normalize_text` plus unicode normalization (NFC default:
    composed form, so 'e'+combining-acute equals the precomposed
    character). Spark ships no unicode-normalize expression, so this
    is an Arrow-batched pandas UDF — use it where content arrives from
    mixed sources; the expression-only variant is the cheap default."""
    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: None if t is None
            else " ".join(unicodedata.normalize(form, t).lower().split())
        )

    return _norm(F.col(text) if isinstance(text, str) else text)


#: PII redaction patterns, applied in order (URL first so its host part
#: can't be half-eaten by the email/IP rules). Restricted to syntax
#: that behaves identically in Java regex (Spark) and RE2 (DuckDB
#: oracle): no lookaround, no backrefs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://\S+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d .()-]{6,}\d", "<PHONE>"),
]


def char_entropy(text: str | Column) -> Column:
    """Shannon entropy (nats) of the character distribution — the
    classic gibberish/boilerplate detector: natural prose sits ~2.9-3.3,
    repeated-character junk and single-token spam fall near 0, uniform
    random base64 pushes past 4. Null text stays null; empty text is
    0.0. Arrow-batched pandas UDF (one numpy bincount per doc) — the
    per-char explode this replaces multiplies row count by document
    length, which is the wrong trade on a large corpus."""
    import numpy as np

    @F.pandas_udf("double")
    def _ent(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            if not t:
                return 0.0
            _, counts = np.unique(list(t), return_counts=True)
            p = counts / counts.sum()
            return float(-(p * np.log(p)).sum())

        return s.map(one)

    return _ent(F.col(text) if isinstance(text, str) else text)


#: HTML entity decodings applied by :func:`strip_html`, in order.
#: ``&amp;`` is decoded LAST so ``&amp;lt;`` renders as the literal
#: ``&lt;`` (the double-escape rule) instead of re-decoding.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def strip_html(text: str | Column) -> Column:
    """Remove HTML markup: comments, ``<script>``/``<style>`` blocks
    with their contents, all remaining tags (each replaced by a space
    so ``a</p><p>b`` doesn't fuse into ``ab``), then decode the common
    entities (:data:`HTML_ENTITIES`). Chained ``regexp_replace`` —
    JVM codegen, map-only, no Python. Patterns avoid lookaround and
    backreferences so an RE2-based engine (or the DuckDB oracle)
    reproduces the output byte-for-byte. Whitespace is NOT collapsed
    here — chain :func:`normalize_text` for that."""
    c = F.col(text) if isinstance(text, str) else text
    # [\s\S] instead of DOTALL-flagged '.' keeps the pattern portable
    c = F.regexp_replace(c, r"<!--[\s\S]*?-->", " ")
    c = F.regexp_replace(c, r"(?i)<script[\s\S]*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?i)<style[\s\S]*?</style\s*>", " ")
    c = F.regexp_replace(c, r"</?[A-Za-z!][^>]*>", " ")
    for entity, repl in HTML_ENTITIES:
        c = F.replace(c, F.lit(entity), F.lit(repl))
    return c


def redact_pii(text: str | Column, kinds: list[str] | None = None) -> Column:
    """Mask emails/URLs/IPs/phone numbers with typed markers — the
    standard scrub before a corpus ships to training. Chained
    ``regexp_replace`` (JVM, codegen); order per :data:`PII_PATTERNS`.
    ``kinds`` selects a subset, keeping the canonical order."""
    c = F.col(text) if isinstance(text, str) else text
    for kind, pat, marker in PII_PATTERNS:
        if kinds is None or kind in kinds:
            c = F.regexp_replace(c, pat, marker)
    return c


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", max_run_tokens: int = 4096
) -> DataFrame:
    """Gopher-style repetition quality signals, map-only (no shuffle —
    each doc's stats come from its own token array):

    - ``n_tokens``;
    - ``distinct_token_frac`` — distinct/total tokens (low ⇒ loops);
    - ``top_bigram_count`` — multiplicity of the most repeated word
      bigram (high ⇒ boilerplate / TEMPLATE TEMPLATE … spam).

    Bigram counting sorts the doc's bigram array and takes the longest
    equal run with an ``aggregate`` HOF — interpreted per element, so
    cost is per-token of a single doc, not per-corpus; docs beyond
    ``max_run_tokens`` tokens fall back to null (route those few to a
    pandas-UDF pass if they matter)."""
    toks = tokens(text_col)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    zero = F.struct(
        F.lit(" ").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top = F.aggregate(F.array_sort(bigrams), zero, _merge, lambda acc: acc["best"])
    return (
        df.withColumn("n_tokens", n)
        .withColumn(
            "distinct_token_frac",
            F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(None)),
        )
        .withColumn(
            "top_bigram_count",
            F.when(n <= max_run_tokens, top).otherwise(F.lit(None)),
        )
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the standard text-stat columns."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("text_len", char_count(text_col))
        .withColumn("punct_ratio", F.round(punct_ratio(text_col), 4))
        .withColumn("quality", F.round(quality_score(text_col), 4))
    )


#: The eight must-contain stopwords of the Gopher quality filter
#: (Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A —
#: public thresholds; RefinedWeb and FineWeb reuse the same rule set).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: Bullet characters for the Gopher bullet-line rule: the paper's
#: '•' plus the markdown bullets real web text uses.
_BULLET_RE = r"^[-*\x{2022}\x{2023}\x{25aa}]"
_ELLIPSIS_LINE_RE = r"(\.\.\.|\x{2026})$"


def with_gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the Gopher rule-based quality REPORT (Rae et al. 2021,
    Appendix A, public thresholds): the per-rule measurements, one
    boolean flag per rule, and the conjunction ``gopher_pass``. This
    is the rule tier every public pipeline (Gopher, RefinedWeb,
    FineWeb) runs before any learned classifier — unlike
    :func:`quality_score` (a composite score) it exposes the flags
    pipelines actually gate on.

    Rules (flag TRUE = keep):

    * ``r_word_count``     — 50 <= word count <= 100,000
    * ``r_mean_word_len``  — 3 <= mean word length <= 10
    * ``r_hash_ratio``     — '#' symbol-to-word ratio <= 0.1
    * ``r_ellipsis_ratio`` — '...'/'…' symbol-to-word ratio <= 0.1
    * ``r_bullet_lines``   — < 90% of lines start with a bullet
    * ``r_ellipsis_lines`` — < 30% of lines end with an ellipsis
    * ``r_alpha_words``    — >= 80% of words contain a letter
    * ``r_stopwords``      — >= 2 distinct :data:`GOPHER_STOPWORDS`

    Scale: pure codegen HOFs (split / regexp_extract_all / filter),
    map-only, zero Python in the row path, engine-portable (Java
    regex and RE2 agree on every pattern — ``\\x{...}`` escapes as in
    :data:`SCRIPT_CLASSES`). Ratios are rounded to 4dp for the
    cross-engine hash contract. Null text yields null measurements
    and flags (callers filter; an all-FALSE row would be
    indistinguishable from a failing document)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_words = F.size(toks)
    nw = F.when(n_words > 0, n_words.cast("double"))  # null-safe denom
    # sum of token lengths == length with all whitespace removed
    mean_wl = F.length(F.regexp_replace(c, r"\s", "")) / nw
    hash_ratio = (F.length(c) - F.length(F.replace(c, F.lit("#")))) / nw
    ellipsis_ratio = (
        F.size(F.regexp_extract_all(c, F.lit(r"\.\.\.|\x{2026}"), 0)) / nw
    )
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("double")  # >= 1 for non-null text
    bullet_frac = (
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike(_BULLET_RE)))
        / n_lines
    )
    ellipsis_line_frac = (
        F.size(
            F.filter(lines, lambda l: F.rtrim(l).rlike(_ELLIPSIS_LINE_RE))
        )
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike(r"[A-Za-z]"))) / nw
    )
    ltoks = F.transform(toks, lambda t: F.lower(t))
    stop_hits = F.size(
        F.filter(
            F.lit(list(GOPHER_STOPWORDS)).cast("array<string>"),
            lambda w: F.array_contains(ltoks, w),
        )
    )
    def _m(expr):  # null text -> null; empty text (0 words) -> 0.0
        return F.when(
            c.isNotNull(), F.round(F.coalesce(expr, F.lit(0.0)), 4)
        )

    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", _m(mean_wl))
        .withColumn("hash_ratio", _m(hash_ratio))
        .withColumn("ellipsis_ratio", _m(ellipsis_ratio))
        .withColumn("bullet_line_frac", _m(bullet_frac))
        .withColumn("ellipsis_line_frac", _m(ellipsis_line_frac))
        .withColumn("alpha_word_frac", _m(alpha_frac))
        .withColumn("stop_hits", F.when(c.isNotNull(), stop_hits))
    )
    flags = {
        "r_word_count": (F.col("n_words") >= 50) & (F.col("n_words") <= 100000),
        "r_mean_word_len": (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0),
        "r_hash_ratio": F.col("hash_ratio") <= 0.1,
        "r_ellipsis_ratio": F.col("ellipsis_ratio") <= 0.1,
        "r_bullet_lines": F.col("bullet_line_frac") < 0.9,
        "r_ellipsis_lines": F.col("ellipsis_line_frac") < 0.3,
        "r_alpha_words": F.col("alpha_word_frac") >= 0.8,
        "r_stopwords": F.col("stop_hits") >= 2,
    }
    for name, flag in flags.items():
        out = out.withColumn(name, flag)
    gopher_pass = None
    for name in flags:
        gopher_pass = (
            F.col(name) if gopher_pass is None else gopher_pass & F.col(name)
        )
    return out.withColumn("gopher_pass", gopher_pass)


#: Unicode-script classes for :func:`script_profile`, as (name, regex
#: char-class) — written with ``\x{...}`` escapes, which Java regex
#: (Spark) and RE2 (DuckDB oracle) both accept.
SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("latin", r"[A-Za-z]"),
    ("digit", r"[0-9]"),
    ("cyrillic", r"[\x{0400}-\x{04ff}]"),
    ("greek", r"[\x{0370}-\x{03ff}]"),
    ("arabic", r"[\x{0600}-\x{06ff}]"),
    ("devanagari", r"[\x{0900}-\x{097f}]"),
    ("cjk", r"[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]"),
]


def script_profile(text: str | Column) -> Column:
    """Per-script character ratios as a struct
    ``(latin, digit, cyrillic, greek, arabic, devanagari, cjk, other)``
    — the writing-system profile multilingual curation routes on
    (:data:`SCRIPT_CLASSES`; ``other`` is the remainder incl.
    whitespace/punctuation). All ``regexp_count``-style codegen
    expressions — map-only, no Python. Ratios are 0.0 for empty text;
    null stays null."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    fields = []
    covered = None
    for name, cls in SCRIPT_CLASSES:
        cnt = F.size(F.regexp_extract_all(c, F.lit(cls), 0))
        ratio = F.when(n > 0, cnt / n).otherwise(F.lit(0.0))
        fields.append(ratio.alias(name))
        covered = cnt if covered is None else covered + cnt
    other = F.when(n > 0, (n - covered) / n).otherwise(F.lit(0.0))
    fields.append(other.alias("other"))
    # null text -> null struct (NOT an all-zero profile, which would be
    # indistinguishable from empty text)
    return F.when(c.isNotNull(), F.struct(*fields))


#: Sentence-ish segmentation pattern: a run of non-terminators followed
#: by any run of terminators. No lookbehind/lookahead, so Java regex
#: (Spark) and RE2 (DuckDB oracle) agree byte-for-byte.
SENTENCE_RE = r"[^.!?]+[.!?]*"


def split_sentences(text: str | Column) -> Column:
    """Sentence-grain segmentation (array<string>): split on
    ``.!?`` runs, each piece trimmed, empties dropped — the
    pre-step for sentence-level dedup, packing, and per-sentence
    quality scoring. Deliberately regex-simple (no abbreviation
    model — 'e.g.' splits) so the SAME segmentation is reproducible
    on any engine; swap in ``F.sentences`` where locale-aware
    splitting matters more than portability. Pure codegen, map-only."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_extract_all(c, F.lit(SENTENCE_RE), 0)
    trimmed = F.transform(pieces, lambda s: F.trim(s))
    return F.filter(trimmed, lambda s: F.length(s) > 0)


def readability_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append classic readability signals (all codegen HOFs, map-only,
    engine-portable): ``n_words`` (whitespace tokens), ``n_sents``
    (``[.!?]+`` runs, floored at 1 so a headline isn't divide-by-zero),
    ``n_syll`` (per-word vowel-group count ``[aeiouy]+``, floored at 1
    per word — the standard cheap syllable proxy), and the two Flesch
    measures over them:

        flesch   = 206.835 - 1.015*(W/S) - 84.6*(Syl/W)
        fk_grade = 0.39*(W/S) + 11.8*(Syl/W) - 15.59

    Rounded to 4dp (+0.0 folds IEEE -0.0); NULL for wordless docs —
    visible, not a silent 0 "perfect readability". A quality gate on
    ``flesch`` composes with quality_score / char_entropy /
    repetition stats; like them it is a HEURISTIC tuned for
    English-like text (the syllable proxy under-counts ideographic
    scripts — gate per language).
    """
    c = F.col(text_col)
    toks = F.regexp_extract_all(F.lower(c), F.lit(r"\S+"), 0)
    words = F.size(toks).cast("long")
    sents = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), 0)), F.lit(1)
    ).cast("long")
    syll = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit(r"[aeiouy]+"), 0)),
                F.lit(1),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("long")

    def rnd(col):
        return F.round(col, 4) + F.lit(0.0)

    wps = words.cast("double") / sents
    spw = syll.cast("double") / words
    guard = F.when(words > 0, F.lit(True))
    return df.select(
        "*",
        words.alias("n_words"),
        sents.alias("n_sents"),
        F.when(guard, syll).alias("n_syll"),
        F.when(
            guard, rnd(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
        ).alias("flesch"),
        F.when(
            guard, rnd(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
        ).alias("fk_grade"),
    )


def _mojibake_pairs() -> list[tuple[str, str]]:
    """(mojibake, fixed) pairs for the common UTF-8-read-as-cp1252
    double-encoding: for every target char, the broken form is its
    UTF-8 bytes decoded as Windows-1252 (the classic web mistake ftfy
    repairs; we cover the cases whose broken form is pure cp1252 —
    targets with an unmappable byte like U+201D's 0x9D are skipped
    rather than guessed). Longest mojibake first so the 3-byte
    'â€¢'-family never gets clipped by a 2-byte 'Ã©'-family rule.
    Generated, not hand-typed, so the table cannot drift from the
    codec it models."""
    targets = [chr(c) for c in range(0xA0, 0x100)] + [
        "‘", "’", "‚", "“", "„",
        "–", "—", "…", "•", "€", "™",
    ]
    out = []
    for ch in targets:
        try:
            moji = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue
        if moji != ch:
            out.append((moji, ch))
    return sorted(out, key=lambda p: -len(p[0]))


#: The frozen (mojibake, fixed) table :func:`fix_encoding` applies.
MOJIBAKE_PAIRS: tuple[tuple[str, str], ...] = tuple(_mojibake_pairs())


def fix_encoding(text: str | Column) -> Column:
    """Repair the common UTF-8-as-Windows-1252 mojibake in place
    ('CafÃ©' -> 'Café', 'â€™' -> '’') — the standard encoding-repair
    stage (ftfy's core case) expressed as a chain of literal
    ``replace`` calls over :data:`MOJIBAKE_PAIRS`. Map-only codegen,
    zero Python in the row path, engine-portable (DuckDB replays the
    identical replace chain byte-for-byte). Heuristic by design:
    text that legitimately contains a mojibake sequence is rewritten
    too — at web-corpus scale that trade is the right one (ftfy makes
    it as well). Null stays null."""
    c = F.col(text) if isinstance(text, str) else text
    for moji, fixed in MOJIBAKE_PAIRS:
        c = F.replace(c, F.lit(moji), F.lit(fixed))
    return c


#: Gopher repetition-filter thresholds (Rae et al. 2021, Table A1):
#: measurement name -> max allowed value (filter out ABOVE).
GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _dup_unit_fracs(c: Column, units: Column, prefix: str) -> list[Column]:
    """``{prefix}_frac`` (excess occurrences / total units) and
    ``{prefix}_char_frac`` (chars of excess occurrences / total unit
    chars) for a trimmed non-empty unit array (lines or paragraphs).
    Codegen HOFs; the inner count runs over the doc's own array only."""
    n = F.size(units)
    nd = F.size(F.array_distinct(units))
    frac = F.when(n > 0, (n - nd) / n.cast("double")).otherwise(F.lit(0.0))
    excess = F.aggregate(
        F.transform(
            F.array_distinct(units),
            lambda u: (
                F.size(F.filter(units, lambda x: x == u)) - 1
            ) * F.length(u),
        ),
        F.lit(0), lambda acc, x: acc + x,
    )
    total = F.aggregate(
        F.transform(units, lambda u: F.length(u)),
        F.lit(0), lambda acc, x: acc + x,
    )
    cfrac = F.when(
        total > 0, excess.cast("double") / total
    ).otherwise(F.lit(0.0))
    return [
        F.when(c.isNotNull(), F.round(frac, 6)).alias(f"{prefix}_frac"),
        F.when(c.isNotNull(), F.round(cfrac, 6)).alias(f"{prefix}_char_frac"),
    ]


def with_repetition_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the Gopher REPETITION filter report (Rae et al. 2021,
    Table A1 — the other half of the rule set next to
    :func:`with_gopher_rules`): duplicate line/paragraph fractions,
    duplicate line/paragraph CHARACTER fractions, the
    most-frequent-2/3/4-gram character fractions, and the
    duplicated-5..10-gram character fractions, plus one boolean flag
    per rule (TRUE = keep, measurement <= threshold) and the
    ``repetition_pass`` conjunction.

    Frozen definitions (engine-parity contract — the DuckDB oracle
    replays each exactly):

    * lines = '\\n'-split, trimmed, empties dropped; paragraphs =
      '\\n\\n+'-split, trimmed, empties dropped.
    * dup_X_frac = occurrences beyond the first of each repeated unit
      / total units; dup_X_char_frac weighs those excess occurrences
      by unit length over total unit chars.
    * word n-grams over ASCII-whitespace tokens of the lowercased
      text; top_Ngram_char_frac = count*len of the most frequent
      n-gram (char-heaviest among count-ties) / length(text);
      dup_Ngram_char_frac = sum of (count-1)*len over n-grams seen
      more than once / length(text). Zero when the doc has no
      n-grams; null text -> null row. NOTE: overlapping repeated
      grams are each counted in full (simpler than Gopher's
      char-coverage union and engine-exact), so pathological loops
      can exceed 1.0 — anything past the 0.10-0.15 thresholds fails
      either way.

    Scale: the line/paragraph metrics are pure codegen HOFs over each
    doc's own arrays; the nine n-gram metrics come from ONE
    Arrow-batched pandas UDF pass (one tokenize + one Counter per doc
    per n — per-doc cost linear in tokens, nothing leaves the row).
    Map-only end to end: no shuffle, no state, stream-safe."""
    import re as _re

    _GRAM_FIELDS = [k for k in GOPHER_REPETITION_THRESHOLDS
                    if "gram" in k]
    _schema = ", ".join(f"{f} double" for f in _GRAM_FIELDS)

    @F.pandas_udf(_schema)
    def _gram_metrics(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            if t is None:
                rows.append({f: None for f in _GRAM_FIELDS})
                continue
            L = len(t)
            toks = _re.findall(r"\S+", t.lower(), _re.ASCII)
            out = {}
            for n in range(2, 11):
                grams = [
                    " ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1)
                ]
                key = (f"top_{n}gram_char_frac" if n <= 4
                       else f"dup_{n}gram_char_frac")
                if not grams or L == 0:
                    out[key] = 0.0
                    continue
                cnt: dict[str, int] = {}
                for g in grams:
                    cnt[g] = cnt.get(g, 0) + 1
                if n <= 4:
                    maxc = max(cnt.values())
                    out[key] = max(
                        c * len(g) for g, c in cnt.items() if c == maxc
                    ) / L
                else:
                    out[key] = sum(
                        (c - 1) * len(g) for g, c in cnt.items() if c > 1
                    ) / L
            rows.append(out)
        return pd.DataFrame(rows, columns=_GRAM_FIELDS)

    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    paras = F.filter(
        F.transform(F.split(c, "\n\n+"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    out = df.select(
        "*",
        *_dup_unit_fracs(c, lines, "dup_line"),
        *_dup_unit_fracs(c, paras, "dup_para"),
        _gram_metrics(c).alias("_gm"),
    )
    for f in _GRAM_FIELDS:
        out = out.withColumn(f, F.round(F.col("_gm")[f], 6))
    out = out.drop("_gm")
    flags = {}
    for name, thr in GOPHER_REPETITION_THRESHOLDS.items():
        flags[f"r_{name}"] = F.col(name) <= thr
    for fname, flag in flags.items():
        out = out.withColumn(fname, flag)
    rep_pass = None
    for fname in flags:
        rep_pass = (
            F.col(fname) if rep_pass is None else rep_pass & F.col(fname)
        )
    return out.withColumn("repetition_pass", rep_pass)


#: Terminal punctuation a kept C4 line must end with (Raffel et al.
#: 2020 §2.2: period, exclamation, question mark, or closing quote).
_C4_LINE_END_RE = r'[.!?]["\x{201d}]?$'


def with_c4_clean(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the C4 cleaning recipe (Raffel et al. 2020, the
    "Colossal Clean Crawled Corpus" rules — the most-cited public
    cleaning stage, run before Gopher-style scoring):

    line level (applied, producing ``c4_text``):

    * keep only lines ending in terminal punctuation
      (``. ! ?`` optionally followed by a closing quote);
    * keep only lines with at least 3 words;
    * drop any line containing the word "javascript"
      (case-insensitive token membership, the paper's boilerplate
      tell).

    page level (flags, not applied):

    * ``has_lorem_ipsum`` — the placeholder phrase anywhere
      (case-insensitive);
    * ``has_curly_brace`` — a literal ``{`` anywhere (code tell);
    * ``n_sentences`` — sentence count of the CLEANED text under the
      repo's frozen ``[.!?]``-run segmentation;
    * ``c4_pass`` — no lorem ipsum, no brace, and >= 5 sentences
      survive (the paper's page gate).

    Returns ``c4_text`` (kept lines re-joined with ``\\n``; empty
    string when nothing survives), ``n_lines``/``n_lines_kept``, the
    flags above. Null text -> null row. Pure codegen HOFs over each
    doc's own line array — map-only, no Python, stream-safe; the
    DuckDB oracle replays every rule byte-exactly."""
    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )

    def _keep(l: Column) -> Column:
        words = F.regexp_extract_all(l, F.lit(r"\S+"), 0)
        return (
            l.rlike(_C4_LINE_END_RE)
            & (F.size(words) >= 3)
            & ~F.array_contains(
                F.transform(words, lambda w: F.lower(w)), "javascript"
            )
        )

    kept = F.filter(lines, _keep)
    c4_text = F.array_join(kept, "\n")
    n_sents = F.size(
        F.filter(
            F.transform(
                F.regexp_extract_all(c4_text, F.lit(SENTENCE_RE), 0),
                lambda s: F.trim(s),
            ),
            lambda s: F.length(s) > 0,
        )
    )
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{")
    return df.select(
        "*",
        F.when(c.isNotNull(), c4_text).alias("c4_text"),
        F.when(c.isNotNull(), F.size(lines)).alias("n_lines"),
        F.when(c.isNotNull(), F.size(kept)).alias("n_lines_kept"),
        F.when(c.isNotNull(), n_sents).alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_curly_brace"),
        (
            ~has_lorem & ~has_brace & (n_sents >= 5)
        ).alias("c4_pass"),
    )


#: Demo weighted blocklist in the UT1 / RefinedWeb style (Penedo et
#: al. 2023 filter documents by weighted hits against the public UT1
#: category lists; weights let one "hard" term outweigh several
#: "soft" ones). Deliberately mild placeholder terms — real
#: deployments pass their own category list(s); the shape (lowercase
#: single-token term -> positive weight) is the contract.
DEFAULT_BLOCKLIST: dict[str, float] = {
    "viagra": 3.0, "casino": 2.0, "xxx": 3.0, "porn": 3.0,
    "jackpot": 1.0, "betting": 1.0, "escort": 2.0, "pills": 1.0,
}


def with_blocklist_score(
    df: DataFrame,
    text_col: str = "text",
    blocklist: dict[str, float] | None = None,
    max_score: float = 1.0,
) -> DataFrame:
    """Append a weighted banned-term report (the UT1-blocklist gate
    every public web pipeline — RefinedWeb, FineWeb, CCNet — runs as
    a cheap first tier before any model-based scoring):

    * ``bl_score``    — sum of weights over all (lowercased,
      whitespace-token) occurrences of blocklisted terms;
    * ``bl_hits``     — number of token occurrences that matched;
    * ``bl_hit_frac`` — ``bl_hits / n_tokens`` (0.0 for empty text);
    * ``blocklist_pass`` — ``bl_score < max_score``.

    Pure codegen HOFs over a literal map (the list is config, not
    data — it never touches the cluster as a join side), map-only,
    no shuffle, no Python, stream-safe. Null text -> null report.
    Terms must be lowercase single tokens with positive weights;
    anything else raises ``ValueError`` loudly at plan time."""
    bl = DEFAULT_BLOCKLIST if blocklist is None else blocklist
    if not bl:
        raise ValueError("blocklist must be non-empty")
    for t, w in bl.items():
        if (not t) or t != t.lower() or any(ch.isspace() for ch in t):
            raise ValueError(
                f"blocklist term {t!r} must be a lowercase single token"
            )
        if not float(w) > 0:
            raise ValueError(f"blocklist weight for {t!r} must be > 0")
    c = F.col(text_col)
    toks = F.transform(tokens(c), lambda t: F.lower(t))
    wmap = F.create_map(
        *[F.lit(x) for t in sorted(bl) for x in (t, float(bl[t]))]
    )
    per_tok = F.transform(
        toks, lambda t: F.coalesce(F.element_at(wmap, t), F.lit(0.0))
    )
    score = F.aggregate(
        per_tok, F.lit(0.0), lambda acc, x: acc + x
    )
    n_hits = F.size(F.filter(per_tok, lambda x: x > 0))
    hit_frac = F.when(F.size(toks) > 0, n_hits / F.size(toks)).otherwise(
        F.lit(0.0)
    )
    return df.select(
        "*",
        F.when(c.isNotNull(), score).alias("bl_score"),
        F.when(c.isNotNull(), n_hits).alias("bl_hits"),
        F.when(c.isNotNull(), hit_frac).alias("bl_hit_frac"),
        F.when(c.isNotNull(), score < F.lit(float(max_score))).alias(
            "blocklist_pass"
        ),
    )


def with_code_switch(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append a code-switch / language-consistency report — the
    precision gate for multilingual corpora, where a doc-level
    language id hides mixed-language pages that poison monolingual
    slices:

    * ``doc_lang``        — the document-level winner
      (:func:`language_scores` rules: stopword-hit argmax, declared
      language order breaks ties, 'und' when nothing hits);
    * ``n_sentences_scored`` — sentences (frozen ``[.!?]``-run
      segmentation) whose own winner is not 'und';
    * ``n_switched``      — scored sentences whose winner differs
      from ``doc_lang``;
    * ``switch_frac``     — ``n_switched / n_sentences_scored``
      (0.0 when nothing scored).

    The per-sentence scorer is the SAME expression tree as
    :func:`language_scores`, built inside a ``transform`` lambda —
    pure codegen HOFs, map-only, no Python, stream-safe; the DuckDB
    oracle replays sentence grain exactly. Null text -> null report."""
    c = F.col(text_col)
    doc_lang = language_scores(c)["lang"]
    sent_langs = F.transform(
        split_sentences(c), lambda s: language_scores(s)["lang"]
    )
    scored = F.filter(sent_langs, lambda lg: lg != "und")
    n_scored = F.size(scored)
    n_switched = F.size(
        F.filter(scored, lambda lg: lg != doc_lang)
    )
    return df.select(
        "*",
        F.when(c.isNotNull(), doc_lang).alias("doc_lang"),
        F.when(c.isNotNull(), n_scored).alias("n_sentences_scored"),
        F.when(c.isNotNull(), n_switched).alias("n_switched"),
        F.when(
            c.isNotNull(),
            F.when(n_scored > 0, n_switched / n_scored).otherwise(0.0),
        ).alias("switch_frac"),
    )
