"""Corpus-cleaning operators for training-data pipelines: PII
redaction, Gopher-style repetition/quality rules, and benchmark
decontamination.

Driver extension scope (no reference counterpart). Everything is
pure Column algebra — regexp/array expressions evaluated JVM-side in
whole-stage codegen; the only join (decontamination) broadcasts the
eval-set shingles, which are benchmark-sized (thousands of rows), so
the corpus side is a map-only pass at any scale.

Regex patterns are written in the RE2-compatible subset (no
backreferences, no lookaround) so the Spark (Java regex) and DuckDB
(RE2) engines accept the identical pattern string — the property the
oracle comparison rests on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------- PII
#: name -> (pattern, replacement token). Deliberately conservative
#: patterns: a redactor that over-matches destroys training text, so
#: each shape requires its full structural context.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # the 2-3-4(-4) dashed phone shapes used by the TPC-H phone
    # column and common intl formats
    "phone": (r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII shape (regexp_count is JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind][0]))


def redact_pii(col: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace every PII match with its type token. Chained
    regexp_replace — one codegen'd projection, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in kinds or list(PII_PATTERNS):
        pat, token = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pat, token)
    return c


# ---------------------------------------------- repetition / quality
def type_token_ratio(col: Column | str) -> Column:
    """distinct tokens / total tokens — the classic lexical-diversity
    signal; boilerplate and generated spam sit far below prose."""
    toks = F.split(F.col(col) if isinstance(col, str) else col, " ")
    return F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))


def top_bigram_fraction(col: Column | str) -> Column:
    """Fraction of all word bigrams taken by the single most frequent
    one (Gopher's repetition family: high value = the doc loops).

    Array algebra over the token array, no explode+groupBy shuffle:
    sort the bigram list, then one fold counts the longest equal run
    — O(b log b) per doc instead of the O(b·distinct) nested scan a
    naive count-per-distinct-bigram formulation costs on long
    documents."""
    toks = F.split(F.col(col) if isinstance(col, str) else col, " ")
    n_bi = F.size(toks) - 1
    bigrams = F.when(
        n_bi >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_bi, F.lit(1))),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.coalesce(top / F.greatest(n_bi, F.lit(1)), F.lit(0.0))


def symbol_word_ratio(col: Column | str) -> Column:
    """Non-alphanumeric, non-space chars per token (markup/code/spam
    indicator)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    n_sym = F.length(F.regexp_replace(c, r"[A-Za-z0-9 ]", ""))
    return n_sym / F.greatest(F.size(toks), F.lit(1))


# ---------------------------------------- HTML boilerplate stripping
#: block-level tag-name alternation shared by the splitter and the
#: anchor peel below
_BLOCK_TAGS = (
    "p|div|li|ul|ol|h[1-6]|br|table|thead|tbody|tr|td|th|"
    "section|article|aside|header|footer|nav|blockquote|pre|form|main|"
    "figure|figcaption"
)
#: block-level elements: each opening OR closing tag is a block
#: boundary. (?i) case-insensitive; \b keeps 'p' from matching
#: '<pre>' — RE2-compatible (ASCII word boundary, no lookaround).
HTML_BLOCK_SPLIT = r"(?i)</?(?:" + _BLOCK_TAGS + r")\b[^>]*>"
#: a block-level tag sitting directly inside an anchor (anchor-open,
#: then tag-free text, then the block tag). Peeled out BEFORE block
#: splitting so card/button markup like <a><div>text</div></a> stays
#: one anchor — otherwise the split separates the anchor open from
#: its text and an all-link navigation block sneaks past the
#: link-density gate as prose. Each peel pass removes one tag layer
#: (no lookaround, so RE2-legal); see _ANCHOR_PEEL_PASSES.
HTML_ANCHOR_BLOCK = r"(?is)(<a\b[^>]*>[^<]*)</?(?:" + _BLOCK_TAGS + r")\b[^>]*>"
#: peel passes: 4 covers real chrome nesting (a > div > h3-ish);
#: deeper pathological nesting degrades to the pre-peel behavior
#: (block kept/dropped by its own text), never breaks
_ANCHOR_PEEL_PASSES = 4
#: anchor inner text (group 1) — the link-density numerator
HTML_ANCHOR = r"(?is)<a\b[^>]*>(.*?)</a>"
#: any remaining tag
HTML_TAG = r"(?s)<[^>]*>"
#: invisible / non-content elements removed before block splitting
HTML_NOISE = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
#: minimal entity decode, applied after tag stripping; '&amp;' LAST so
#: '&amp;lt;' decodes to '&lt;' (one level), never to '<'.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
)


def _html_unescape(c: Column) -> Column:
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _norm_ws(c: Column) -> Column:
    # explicit ASCII class, NOT \s: Java \s is ASCII but Python's is
    # not — an explicit class means every engine (Java, RE2, Python
    # re) normalizes identically
    return F.trim(F.regexp_replace(c, r"[ \t\r\n]+", " "))


def _drop_noise(c: Column) -> Column:
    for pat in HTML_NOISE:
        c = F.regexp_replace(c, pat, " ")
    return c


def strip_tags(col: Column | str) -> Column:
    """Plain text of an HTML fragment: script/style/comments dropped,
    every tag replaced by a space, minimal entity decode, whitespace
    normalized. Pure Column algebra (codegen'd regex passes)."""
    c = F.col(col) if isinstance(col, str) else col
    return _norm_ws(_html_unescape(F.regexp_replace(_drop_noise(c), HTML_TAG, " ")))


def html_main_content(
    col: Column | str,
    min_block_chars: int = 30,
    max_link_density: float = 0.30,
) -> Column:
    """Rule-based main-content extraction for raw HTML — the standard
    step between a crawl and every text operator downstream
    (boilerplate navigation/footer chrome poisons dedup shingles,
    quality scores, and token counts alike). Deterministic block
    algebra in the jusText/Boilerpipe family, engine-portable by
    construction (every rule is an RE2-compatible regex or integer
    arithmetic, so a SQL oracle replays it exactly):

    1. drop invisible elements (script/style/comments);
    2. split on block-level tag boundaries (HTML_BLOCK_SPLIT) —
       blocks are the natural boilerplate granularity, markup depth
       is irrelevant to it;
    3. per block, compute the tag-stripped text and its anchor-only
       text (HTML_ANCHOR inner content, same normalization);
    4. keep blocks with >= ``min_block_chars`` of text whose
       link-text share is <= ``max_link_density`` — navigation bars
       and footers are short and nearly-all-links, prose is neither
       (the classic link-density heuristic);
    5. join kept blocks in document order, single-spaced.

    Inputs with no tag at all bypass the gates (normalize + entity
    decode only), so plain text passes through regardless of length
    and the operator is idempotent on its own output (caveat: text
    whose CONTENT contains literal angle-bracket pairs or encoded
    entities is altered by a second pass — re-cleaning cleaned text
    is a caller bug the bypass makes harmless for real prose).

    One narrow projection per row — no shuffle, no UDF; at 100 TB
    this runs inside the scan stage like every other Column op."""
    c = F.col(col) if isinstance(col, str) else col
    pre = _drop_noise(c)
    # keep anchors whole across the block split: peel block tags out
    # of anchor interiors (HTML_ANCHOR_BLOCK) so all-link card markup
    # can't dodge the link-density gate
    for _ in range(_ANCHOR_PEEL_PASSES):
        pre = F.regexp_replace(pre, HTML_ANCHOR_BLOCK, r"$1 ")
    blocks = F.split(pre, HTML_BLOCK_SPLIT)

    def _metrics(b: Column) -> Column:
        txt = _norm_ws(_html_unescape(F.regexp_replace(b, HTML_TAG, " ")))
        ltxt = _norm_ws(
            _html_unescape(
                F.regexp_replace(
                    F.array_join(F.regexp_extract_all(b, F.lit(HTML_ANCHOR), F.lit(1)), " "),
                    HTML_TAG,
                    " ",
                )
            )
        )
        return F.struct(txt.alias("txt"), F.length(ltxt).alias("ln"))

    kept = F.filter(
        F.transform(blocks, _metrics),
        lambda s: (F.length(s["txt"]) >= F.lit(min_block_chars))
        & (
            s["ln"].cast("double")
            <= F.lit(float(max_link_density)) * F.length(s["txt"]).cast("double")
        ),
    )
    joined = _norm_ws(F.array_join(F.transform(kept, lambda s: s["txt"]), " "))
    return F.when(~c.rlike(HTML_TAG), _norm_ws(_html_unescape(c))).otherwise(joined)


def gopher_rules(
    col: Column | str,
    min_tokens: int = 5,
    max_tokens: int = 10000,
    min_ttr: float = 0.2,
    max_top_bigram: float = 0.25,
    max_symbol_ratio: float = 0.5,
) -> Column:
    """Gopher-style keep/drop verdict as a struct of named boolean
    rules plus the conjunction (``keep``). Thresholds are arguments —
    corpus tuning belongs to the caller; defaults follow the
    published rule shapes scaled to test-fixture documents."""
    toks = F.split(F.col(col) if isinstance(col, str) else col, " ")
    n = F.size(toks)
    r_len = (n >= min_tokens) & (n <= max_tokens)
    r_ttr = type_token_ratio(col) >= min_ttr
    r_rep = top_bigram_fraction(col) <= max_top_bigram
    r_sym = symbol_word_ratio(col) <= max_symbol_ratio
    return F.struct(
        r_len.alias("len_ok"),
        r_ttr.alias("ttr_ok"),
        r_rep.alias("repetition_ok"),
        r_sym.alias("symbol_ok"),
        (r_len & r_ttr & r_rep & r_sym).alias("keep"),
    )


def gopher_metrics_table(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_tokens, ttr, top_bigram, sym_ratio) via an Arrow
    mapInPandas kernel — algorithmically IDENTICAL to the Column
    formulations above (same split semantics, same max(n,1) guards,
    same int/int→double divisions, so outputs are byte-identical; a
    parity test pins this). Kept as the execution path because the
    top-bigram sort+fold is a nested higher-order expression that
    evaluates interpreted per element — measured ~10× slower than
    Counter over Arrow batches at 5k docs. Map-only: no shuffle, no
    state; scales as a plain projection at any corpus size."""
    import re as _re
    from collections import Counter as _Counter

    import pandas as _pd

    from mfdb_hafro_etl_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)

    _sym = _re.compile(r"[A-Za-z0-9 ]")

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids, nt, ttr, tb, sy = [], [], [], [], []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                t = t or ""
                toks = t.split(" ")
                n = len(toks)
                d = max(n, 1)
                if n >= 2:
                    top = max(
                        _Counter(
                            toks[i] + " " + toks[i + 1] for i in range(n - 1)
                        ).values()
                    )
                    top_frac = top / (n - 1)
                else:
                    top_frac = 0.0
                ids.append(did)
                nt.append(n)
                ttr.append(len(set(toks)) / d)
                tb.append(top_frac)
                sy.append(len(_sym.sub("", t)) / d)
            yield _pd.DataFrame(
                {
                    id_col: ids,
                    "n_tokens": nt,
                    "ttr": ttr,
                    "top_bigram": tb,
                    "sym_ratio": sy,
                }
            )

    from mfdb_hafro_etl_spark.session import spread_for_kernel

    src = spread_for_kernel(df.select(id_col, text_col))
    id_type = src.schema[id_col].dataType.simpleString()
    return src.mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_type}, n_tokens int, ttr double, "
            "top_bigram double, sym_ratio double"
        ),
    )


# ------------------------------------------------- decontamination
def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ≥
    ``min_shared`` distinct word-``n``-grams with any eval-set doc —
    the standard guard against test-set leakage into training data.

    Plan shape at scale: the eval side is benchmark-sized, so its
    distinct shingle set is broadcast; the corpus side shingles in a
    map (explode) and the contamination check is a broadcast-hash
    semi-join — NO corpus shuffle. Returns (id, n_shared_ngrams) for
    contaminated docs only; anti-join the result against the corpus
    to drop them.
    """
    from mfdb_hafro_etl_spark.operators.dedup import shingle_table

    corpus_sh = shingle_table(corpus, id_col, text_col, n)
    eval_sh = (
        shingle_table(eval_set, id_col, text_col, n)
        .select("shingle")
        .dropDuplicates()
    )
    return (
        corpus_sh.join(F.broadcast(eval_sh), on="shingle", how="inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
        .filter(F.col("n_shared_ngrams") >= min_shared)
    )


# ------------------------------------------------- URL canonicalization
#: query parameters dropped by canonicalize_url: per-click tracking
#: noise that makes byte-identical pages look distinct to an exact
#: URL dedup (the first dedup any crawl pipeline runs, before any
#: content is even fetched twice). RE2-compatible, anchored at the
#: start of one `key=value` token. Deliberately UNAMBIGUOUS shapes
#: only: bare `ref` is excluded because major sites use it as a
#: resource selector (e.g. ?ref=<branch>), where dropping it merges
#: distinct resources — permanent recall loss, the one failure a
#: dedup key must never cause; `ref_src` is the Twitter-specific
#: tracking variant and stays.
URL_TRACKING_PARAM = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref_src)="

#: scheme prefix that marks a string as a canonicalizable URL
_URL_SCHEME = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def canonicalize_url(
    col: Column | str,
    strip_www: bool = True,
    tracking_param_pattern: str = URL_TRACKING_PARAM,
) -> Column:
    """Canonical form of a URL for exact URL-level dedup — the
    cheapest and first dedup step of a crawl pipeline (dedupe the
    frontier/seen-set BEFORE fetching or shingling anything):

    1. drop the fragment (``#...`` is client-side only);
    2. lowercase the scheme and host (case-insensitive per RFC 3986);
    3. drop a leading ``www.`` label (``strip_www=True``);
    4. drop the default port (``http:80`` / ``https:443``);
    5. collapse duplicate slashes in the path and strip trailing
       slashes (empty path -> ``/``);
    6. drop tracking query parameters (``tracking_param_pattern``)
       and SORT the survivors, so parameter order can't split one
       resource into many keys.

    Non-URL strings (no ``scheme://`` prefix) pass through trimmed
    but otherwise unchanged, so the operator is safe on mixed
    columns. A ``userinfo@`` prefix in the authority is kept
    VERBATIM (case-sensitive per RFC 3986 — only scheme and host
    fold); IPv6-literal authorities are out of scope (the bracketed
    literal is treated as part of the host token). Idempotent on its
    own output (property-tested, including stacked ``www.www.``
    labels).

    Pure Column algebra — regexp/array expressions in one codegen'd
    projection, no UDF, no shuffle; every pattern is RE2-compatible
    so a DuckDB oracle replays the identical chain (suite arm
    x_clean_urldedup)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    # [\s\S] not '.': Java regex '.' won't cross an embedded newline
    # without DOTALL, so a malformed URL with '\n' after '#' would
    # keep its fragment — the class form holds the 'fragment never
    # survives' invariant and reads identically in RE2 (DuckDB oracle)
    nofrag = F.regexp_replace(c, r"#[\s\S]*", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.regexp_extract(nofrag, _URL_SCHEME + r"([^/?#]*)", 1)
    # userinfo (anything through the last '@') folds NOTHING —
    # credentials/identities are case-sensitive; only the host after
    # it lowercases
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(authority, r"^.*@", ""))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    if strip_www:
        # (www.)+ not www.: stacked labels must collapse in ONE pass
        # or the output isn't a fixpoint and a re-canonicalized key
        # migrates
        host = F.regexp_replace(host, r"^(www\.)+", "")
    portpart = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    rawpath = F.regexp_extract(nofrag, _URL_SCHEME + r"[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(F.regexp_replace(rawpath, r"//+", "/"), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(nofrag, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(tracking_param_pattern),
    )
    qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        userinfo,
        host,
        portpart,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(c.rlike(_URL_SCHEME), canon).otherwise(c)


def url_dedup(
    df: DataFrame, url_col: str, id_col: str, strip_www: bool = True
) -> DataFrame:
    """Exact dedup at URL granularity: group by canonicalize_url,
    keep the smallest id per canonical key. Returns (canonical_url,
    keep_id, n_dupes) — one row per distinct resource. A single
    hash aggregation over the scan (the same linear shape as
    exact_dedup over content); at 100 TB the canonical key is
    computed inside the scan stage and only the aggregate shuffles."""
    return (
        df.select(
            canonicalize_url(url_col, strip_www=strip_www).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def remove_repeated_units(
    col: Column | str, sep: str = "\n", min_len: int = 0
) -> Column:
    """Drop repeated units (lines / paragraphs / sentences, per
    ``sep``) WITHIN a document, keeping each unit's first occurrence
    in order — the intra-document sibling of the cross-document span
    dedup (dedup.duplicate_spans): crawled pages repeat nav strings,
    cookie banners, and share-bar text many times inside one page,
    and token counts / quality scores / shingle tables all skew on
    the repeats. Units shorter than ``min_len`` characters are kept
    unconditionally (blank separators and stub fragments are
    structure, not boilerplate).

    Pure Column algebra: split → keep a[i] iff array_position(a,
    a[i]) == i (first occurrence) → rejoin. The per-doc work is
    quadratic in the UNIT count of one document (array_position scans
    per element) but runs JVM-side inside the scan projection —
    bounded by document size, embarrassingly parallel across docs,
    no shuffle. Idempotent; a document with no separator passes
    through unchanged."""
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    # split's pattern arg is a REGEX: escape the separator so '|',
    # '.', etc. split literally (the oracle's string_split is literal)
    a = F.split(c, _re.escape(sep))
    kept = F.filter(
        a,
        lambda u, i: (F.length(u) < F.lit(min_len))
        | (F.array_position(a, u) == i + F.lit(1)),
    )
    return F.array_join(kept, sep)
