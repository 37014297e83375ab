"""Text-analysis operators for large-scale training-data pipelines.

No reference counterpart (the driver's extension scope): language-ID
heuristic, quality scoring, token counting, document fingerprinting.
Everything is pure Column algebra over token arrays — JVM-side,
whole-stage codegen, no UDFs — so the operators scale linearly with
partition count at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lists for the language-ID heuristic
# (stopword-overlap scoring; swap for real lists in production).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "y", "es"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "de", "et", "est"],
}

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def tokens(col: Column | str, sep: str = " ") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the baseline tokenizer; a BPE-ish
    regex tokenizer is token_count_bpe below)."""
    return F.size(tokens(col))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish sub-word proxy: splits on whitespace AND punctuation
    boundaries, counting letter-runs, digit-runs and symbols
    separately (regex analog of a byte-pair pre-tokenizer)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(F.regexp_replace(c, r"([^\sA-Za-z0-9]+)", r" $1 "), r"\s+")
    return F.size(F.filter(pieces, lambda x: x != ""))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS)])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: rewards stopword
    presence and moderate token length, penalizes very short docs —
    the shape of a C4/Gopher-style quality rule, minus the corpus
    tuning."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    sw = stopword_ratio(c)
    mlen = mean_token_len(c)
    len_ok = F.when((n >= 20) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    wlen_ok = F.when((mlen >= 3) & (mlen <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(F.least(F.lit(1.0), (sw * 2 + len_ok + wlen_ok) / 3), 6)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-hit count per language (n-gram/stopword heuristic)."""
    toks = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marr, t)))
    return out


def lang_guess(col: Column | str) -> Column:
    """argmax over lang_scores with deterministic tie-break on the
    language code ('en' wins ties only via its alphabetical slot)."""
    scores = lang_scores(col)
    # build struct array (score, lang) and take max — deterministic:
    # ties resolved by lang code ascending via struct comparison
    pairs = F.array(
        *[F.struct(v.alias("score"), F.lit(k).alias("lang")) for k, v in sorted(scores.items())]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["score"] > 0))
    return F.coalesce(best["lang"], F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """Order-sensitive document fingerprint: md5 over the
    concatenation of per-token md5s (a rolling-hash analog that is
    exactly reproducible in ANSI SQL for the oracle)."""
    toks = tokens(col)
    return F.md5(F.concat_ws("", F.transform(toks, F.md5)))
