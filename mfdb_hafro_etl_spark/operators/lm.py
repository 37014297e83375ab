"""CCNet-style n-gram language-model quality filter.

The one standard stage of a public LLM-data pipeline the rule-based
cleaning family (cleaning.py: PII, Gopher rules, HTML extraction, URL
dedup, decontamination) does not cover: train a statistical LM on a
CLEAN reference corpus, score every candidate document's perplexity
under it, and bucket the corpus head/middle/tail — documents that the
clean-corpus LM finds surprising are boilerplate, spam, or noise
(Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data", LREC 2020, which uses a 5-gram KenLM; the public
method, not any implementation, is what this module reproduces).

Model: an interpolated **bigram Kneser-Ney** LM (Kneser & Ney 1995;
Chen & Goodman 1999 eq. 4.15-4.26, the public formulation):

    p(w | c) = max(cnt(c,w) - D, 0) / cnt(c)
             + (D * n_succ(c) / cnt(c)) * p_cont(w)
    p_cont(w) = n_prec(w) / n_types

with ``n_succ(c)`` = distinct successors of context c, ``n_prec(w)`` =
distinct contexts preceding w, ``n_types`` = distinct bigram types,
and discount ``D`` estimated as n1/(n1 + 2*n2) over bigram type counts
(Ney et al. 1994) unless given. Out-of-vocabulary tokens map to
``<unk>`` (tokens below ``min_count`` at train time supply its mass);
each document is scored as ``<s> w1 w2 ...`` — every real token gets a
conditional probability, ``<s>`` is context only. Unseen CONTEXT backs
off to p_cont entirely; the truly-unseen corner (``<unk>`` absent from
training because no token was rare) floors at 1/(vocab_size+1) so the
score is total and deterministic.

Why the ORACLE-BACKED arm is bigram, not KenLM's 5-gram: the arm's
model must be a closed algebra of Spark aggregations whose DuckDB
oracle replays the identical IEEE expression tree (suite arm
x_lm_perplexity); recursion depth 2 keeps that scoring expression one
CASE. A full interpolated TRIGRAM KN (continuation counts at the
middle order, per-order discounts — Chen & Goodman 1999 §4) ships as
train_trigram_kn / perplexity3 with the same scale shape and is
pinned by property tests (per-context normalization, backoff) rather
than a SQL oracle.

Scale shape (the 100 TB judgment):
- **Training** is two corpus scans (one for the vocabulary, one for
  pair counts — the vocabulary must exist before unk-mapping) and
  three hash aggregations; every intermediate is type-sized, never
  corpus-sized. No windows: bigram pairs are built INSIDE the scan as
  array algebra (transform + explode), so no per-document shuffle.
- **Scoring** joins the exploded corpus pairs against the model
  tables. The model is vocabulary-sized (bounded by ``min_count`` and
  the Heaps-law type/token gap, not by corpus size); with
  ``broadcast_model=True`` (default) every model join is a broadcast
  hash join and the only shuffle in the whole score is the final
  per-document sum. For a vocabulary too large to broadcast, pass
  False and the joins become ordinary token-keyed equi-joins that AQE
  plans — still linear, never corpus x corpus.
- **Bucketing** is a codegen'd CASE against scalar thresholds;
  thresholds come from percentile_approx (mergeable sketch, the scale
  path) or exact percentile (single-group sort aggregate — corpus
  stats, use only where exactness is the contract).

Reference scope note: the reference ETL (R/initdb.R) has no LM stage;
this module is driver-extension scope (training-data pipeline
operators), same as dedup.py / cleaning.py.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.exprcache import column_template
from mfdb_hafro_etl_spark.session import spread_for_kernel

BOS = "<s>"
UNK = "<unk>"

#: compressed-source bytes per scoring task. The KN scorer's probe
#: stage (explode + 3-8 broadcast hash probes + log/CASE per n-gram)
#: measures ~10^4 x scan CPU per byte — an order denser than the Arrow
#: kernels spread_for_kernel's 64 KB default was sized for — so the
#: fan-out saturates sooner. Targets are still capped at
#: 2 x defaultParallelism, so this only decides how SOON the cap is
#: reached; at real corpus scale the input is already over-split and
#: the spread is a no-op.
_LM_SCORE_BYTES_PER_TASK = 8 << 10

#: Perplexity of an empty document is undefined; scoring returns NULL.


def lm_tokens(col: Column | str) -> Column:
    """Whitespace tokenization, lowercased, empties dropped — the
    corpus-wide convention (text.py token_count, bpe_word_freq) so LM
    scores compose with the other text operators' token counts.
    String names route through a memoized template (exprcache)."""
    if isinstance(col, str):
        return _lm_tokens_named(col)
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


@column_template
def _lm_tokens_named(name: str) -> Column:
    return lm_tokens(F.col(name))


@column_template
def _pairs_named(name: str) -> Column:
    """_pairs over a token-array column name — memoized template."""
    return _pairs(F.col(name))


@column_template
def _pairs_tokens(text_col: str) -> Column:
    """_pairs over lm_tokens(text_col) — memoized template."""
    return _pairs(lm_tokens(text_col))


def _pairs(toks: Column) -> Column:
    """(context, word) bigram pairs as array algebra inside the scan:
    element i pairs with element i-1 (1-based element_at), the first
    token with BOS. No window, no per-document shuffle."""
    return F.transform(
        toks,
        lambda w, i: F.struct(
            F.when(i == F.lit(0), F.lit(BOS))
            .otherwise(F.element_at(toks, i))
            .alias("c"),
            w.alias("w"),
        ),
    )


@dataclass
class BigramKN:
    """A trained bigram Kneser-Ney model: three type-sized count
    tables plus the scalar statistics the closed-form score needs.
    The DataFrames are persisted by train_bigram_kn (they are read
    once per scoring join but cost a corpus scan to rebuild);
    call unpersist() when done."""

    vocab: DataFrame  # (w)                     tokens with cnt >= min_count
    bigrams: DataFrame  # (c, w, cnt)           unk-mapped bigram counts
    contexts: DataFrame  # (c, cnt_c, n_succ)   per-context total + distinct successors
    continuation: DataFrame  # (w, n_prec)      distinct contexts preceding w
    n_types: int  # distinct bigram types
    vocab_size: int  # |vocab| (excluding BOS/UNK)
    discount: float  # D in [0, 1]
    min_count: int

    def unpersist(self) -> None:
        for df in (self.vocab, self.bigrams):
            try:
                df.unpersist()
            except Exception:
                pass


def _maybe_broadcast(df: DataFrame, flag: bool) -> DataFrame:
    return F.broadcast(df) if flag else df


def train_bigram_kn(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    discount: float | None = None,
    persist: bool = True,
) -> BigramKN:
    """Fit the model from a clean reference corpus in ONE corpus scan
    (r12; previously two): the raw (unmapped) pair-count type table is
    built first, and the vocabulary derives from it — every token
    appears exactly ONCE as the ``w`` of exactly one pair (``_pairs``
    emits one struct per token, BOS only ever on the context side), so
    unigram counts are exactly ``sum(cnt) group by w_raw`` over the
    raw type table, no second pass over the corpus. The unk-mapping
    joins then run against the TYPE table (vocab-sized) instead of
    the position-level token stream, and re-aggregate (the mapping
    collapses rare keys into UNK). Counts are bit-identical to the
    two-scan form by construction. The raw type table is persisted
    for the duration of training and released before returning — with
    ``persist=False`` nothing is cached and the vocabulary and pair
    branches each re-scan the corpus (the historical shape: correct,
    slower; use for one-shot harness runs where leaving cached
    fragments on the executors would pollute later timings)."""
    toks = lm_tokens(text_col)
    # the training scan gets the scorer's cost-gated fan-out: the
    # explode + per-gram partial-aggregate stage is as CPU-dense as
    # scoring, and a single-row-group parquet source otherwise pins it
    # to ONE core (measured: 2.5 s single-task stage at sf0.1). All
    # training outputs are grouping aggregates, so the round-robin
    # partitioning cannot change any count.
    src = spread_for_kernel(
        df.select(text_col), bytes_per_task=_LM_SCORE_BYTES_PER_TASK
    )
    # no empty-doc filter here: explode() of an empty (or NULL) token
    # array already emits zero rows, and an explicit size()>0 filter
    # gets PUSHED BELOW the fan-out exchange by the optimizer, which
    # re-tokenizes the whole corpus inside the single-split scan stage
    # (measured: 2.3 s single-task stage) — the exact starvation the
    # fan-out exists to remove.
    base = src.select(toks.alias("__toks__"))

    def _keep(d: DataFrame) -> DataFrame:
        return d.persist() if persist else d

    raw3 = base.select(F.explode(_pairs_named("__toks__")).alias("p")).select(
        F.col("p.c").alias("c_raw"), F.col("p.w").alias("w_raw")
    )
    raw = raw3.groupBy("c_raw", "w_raw").agg(F.count(F.lit(1)).alias("rcnt"))
    if persist:
        raw = raw.persist()
    uni = raw.groupBy(F.col("w_raw").alias("w")).agg(F.sum("rcnt").alias("cnt"))
    vocab = _keep(uni.filter(F.col("cnt") >= min_count).select("w"))

    vc = vocab.select(F.col("w").alias("__vc__"))
    vw = vocab.select(F.col("w").alias("__vw__"))
    mapped = (
        raw.join(F.broadcast(vc), F.col("c_raw") == F.col("__vc__"), "left")
        .join(F.broadcast(vw), F.col("w_raw") == F.col("__vw__"), "left")
        .select(
            F.when(F.col("c_raw") == BOS, F.lit(BOS))
            .otherwise(F.coalesce(F.col("__vc__"), F.lit(UNK)))
            .alias("c"),
            F.coalesce(F.col("__vw__"), F.lit(UNK)).alias("w"),
            F.col("rcnt"),
        )
    )
    bigrams = _keep(
        mapped.groupBy("c", "w").agg(F.sum("rcnt").alias("cnt"))
    )
    contexts = bigrams.groupBy("c").agg(
        F.sum("cnt").alias("cnt_c"), F.count(F.lit(1)).alias("n_succ")
    )
    continuation = bigrams.groupBy("w").agg(F.count(F.lit(1)).alias("n_prec"))

    # ONE action for all four training scalars (n_types, n1, n2,
    # vocab_size): the two single-row aggregates cross-join into one
    # row, so the driver pays one job-submission round-trip instead of
    # two — with persist=False that is also the difference between one
    # and two corpus re-scans for the vocabulary subtree
    stats = (
        bigrams.agg(
            F.count(F.lit(1)).alias("n_types"),
            F.count_if(F.col("cnt") == 1).alias("n1"),
            F.count_if(F.col("cnt") == 2).alias("n2"),
        )
        .crossJoin(vocab.agg(F.count(F.lit(1)).alias("vsize")))
        .head()
    )
    # the stats action has fully materialized the persisted vocab and
    # bigrams tables; the raw type table's blocks are no longer needed
    if persist:
        try:
            raw.unpersist()
        except Exception:
            pass
    n_types = stats["n_types"]
    vocab_size = stats["vsize"]
    if discount is None:
        n1, n2 = stats["n1"], stats["n2"]
        # Ney-Essen-Kneser estimate; degenerate corpora (no singleton
        # types) get the textbook 0.75 constant
        discount = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) > 0 else 0.75
    # D == 1 is the valid all-mass-backs-off corner (the Ney estimate
    # hits it when n2 == 0); conservation holds since max(c-D, 0) >= 0
    if not (0.0 <= discount <= 1.0):
        raise ValueError(f"discount must be in [0, 1], got {discount}")
    return BigramKN(
        vocab=vocab,
        bigrams=bigrams,
        contexts=contexts,
        continuation=continuation,
        n_types=n_types,
        vocab_size=vocab_size,
        discount=float(discount),
        min_count=min_count,
    )


def perplexity(
    df: DataFrame,
    lm: BigramKN,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
    out_tokens: str = "n_tokens",
    out_logprob: str = "logprob",
    out_ppl: str = "ppl",
) -> DataFrame:
    """Score each document under the model: per-token natural
    log-probability summed per document, perplexity
    exp(-logprob / n_tokens). Documents with no tokens score NULL.

    One shuffle total with broadcast_model=True (the per-document
    sum); the model joins are broadcast hash joins in the scan stage.
    The probability expression is written with fixed association so a
    SQL oracle replays the identical IEEE tree (suite arm
    x_lm_perplexity)."""
    D = lm.discount
    floor = 1.0 / (lm.vocab_size + 1)

    # fan the scoring scan out (session.spread_for_kernel): the
    # explode + model-probe + partial-sum stage costs ~10^4 x scan CPU
    # per byte, and a single-row-group parquet source arrives as ONE
    # task no matter the split config (row groups are the split floor)
    # — measured 8.5 s on 1 of 32 cores at the 600 KB fixture, ~0.2 s
    # spread. Cost-gated and capped at 2 x parallelism, so a real
    # many-split corpus scan is untouched; per-document sums are
    # unaffected because each document's rows stay in one partition
    # (the round-robin moves whole pre-explode rows).
    src = spread_for_kernel(
        df.select(id_col, text_col), bytes_per_task=_LM_SCORE_BYTES_PER_TASK
    )
    pairs = src.select(
        F.col(id_col), F.explode(_pairs_tokens(text_col)).alias("p")
    ).select(id_col, F.col("p.c").alias("c_raw"), F.col("p.w").alias("w_raw"))

    vc = lm.vocab.select(F.col("w").alias("__vc__"))
    vw = lm.vocab.select(F.col("w").alias("__vw__"))
    mapped = (
        pairs.join(_maybe_broadcast(vc, broadcast_model), F.col("c_raw") == F.col("__vc__"), "left")
        .join(_maybe_broadcast(vw, broadcast_model), F.col("w_raw") == F.col("__vw__"), "left")
        .select(
            id_col,
            F.when(F.col("c_raw") == BOS, F.lit(BOS))
            .otherwise(F.coalesce(F.col("__vc__"), F.lit(UNK)))
            .alias("c"),
            F.coalesce(F.col("__vw__"), F.lit(UNK)).alias("w"),
        )
    )
    joined = (
        mapped.join(_maybe_broadcast(lm.bigrams, broadcast_model), ["c", "w"], "left")
        .join(_maybe_broadcast(lm.contexts, broadcast_model), ["c"], "left")
        .join(_maybe_broadcast(lm.continuation, broadcast_model), ["w"], "left")
    )
    p_cont_raw = F.coalesce(F.col("n_prec"), F.lit(0)) / F.lit(lm.n_types)
    p_cont = F.when(p_cont_raw > 0, p_cont_raw).otherwise(F.lit(floor))
    p_raw = F.when(F.col("cnt_c").isNull(), p_cont).otherwise(
        F.greatest(F.coalesce(F.col("cnt"), F.lit(0)) - F.lit(D), F.lit(0.0))
        / F.col("cnt_c")
        + (F.lit(D) * F.col("n_succ") / F.col("cnt_c")) * p_cont
    )
    # keep the score TOTAL at D == 0 (Ney estimate with no singleton
    # types, or an explicit discount=0.0): an unseen bigram under a
    # seen context then has p == 0, and F.log(0) is NULL, which sum()
    # would silently skip while n_tokens still counts the token —
    # perplexity would be silently UNDERestimated. Floor to the same
    # deterministic 1/(vocab_size+1) the unseen-vocab corner uses; for
    # any D > 0 the seen-context branch is strictly positive (n_succ
    # >= 1 and p_cont > 0), so this branch never fires and the IEEE
    # tree the oracle replays is value-identical.
    p = F.when(p_raw > F.lit(0.0), p_raw).otherwise(F.lit(floor))
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias(out_tokens), F.sum(F.log(p)).alias(out_logprob)
    )
    return (
        df.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            id_col,
            F.coalesce(F.col(out_tokens), F.lit(0)).alias(out_tokens),
            F.col(out_logprob),
            F.when(
                F.col(out_tokens) > 0,
                F.exp(-F.col(out_logprob) / F.col(out_tokens)),
            ).alias(out_ppl),
        )
    )


def ppl_bucket(
    col: Column | str, head_max: float, tail_min: float, out_null: str = "tail"
) -> Column:
    """CCNet head/middle/tail bucketing against SCALAR thresholds —
    one codegen'd CASE, no shuffle. Thresholds are constants by
    design (CCNet computes per-language cutoffs once, then applies
    them as constants to the whole crawl); compute them with
    ppl_thresholds. Unscorable documents (NULL perplexity = no
    tokens) land in ``out_null`` (default tail: an empty document is
    not head-quality)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull(), F.lit(out_null))
        .when(c < F.lit(head_max), F.lit("head"))
        .when(c < F.lit(tail_min), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )


def ppl_thresholds(
    scored: DataFrame,
    ppl_col: str = "ppl",
    cuts: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    exact: bool = False,
    relative_error: float = 0.001,
) -> list[float]:
    """Corpus percentile cutoffs for ppl_bucket. Default is
    percentile_approx (mergeable Greenwald-Khanna sketch — the 100 TB
    path: one pass, fixed-size state, deterministic for a given
    dataset). ``exact=True`` uses the exact percentile aggregate —
    required where the cutoff must match an external quantile_cont
    bit-for-bit (the oracle-parity arms). Its scale shape is better
    than 'single-group sort' suggests: Spark's Percentile aggregate
    keeps a value→count map with map-side partial aggregation, so the
    single reducer merges DISTINCT-value histograms, not rows — and
    callers feeding it 6dp-ROUNDED perplexities bound the distinct
    count by the rounded value range, corpus-size-independent."""
    c = F.col(ppl_col)
    if exact:
        agg = F.percentile(c, F.array(*[F.lit(q) for q in cuts]))
    else:
        agg = F.percentile_approx(
            c, F.array(*[F.lit(q) for q in cuts]), int(1.0 / relative_error)
        )
    row = scored.filter(c.isNotNull()).agg(agg.alias("qs")).head()
    if row is None or row["qs"] is None:
        raise ValueError("ppl_thresholds: no scorable documents")
    return [float(v) for v in row["qs"]]


# ------------------------------------------------------------- persistence
_LM_META = "_lm_meta.json"
_LM_SUBTABLES = ("vocab", "bigrams", "contexts", "continuation")


def lm_write(lm: BigramKN, path: str) -> None:
    """Persist the model as four parquet subtables plus a meta file.
    Meta is retired FIRST and written LAST (the dedup/IVF index
    discipline: a crash mid-write leaves a visibly-torn model — no
    meta — never a silently-stale one)."""
    meta_path = os.path.join(path, _LM_META)
    if os.path.exists(meta_path):
        os.remove(meta_path)
    for name in _LM_SUBTABLES:
        getattr(lm, name).write.mode("overwrite").parquet(
            os.path.join(path, name)
        )
    meta = {
        "n_types": lm.n_types,
        "vocab_size": lm.vocab_size,
        "discount": lm.discount,
        "min_count": lm.min_count,
        "order": 2,
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)


def lm_read(spark: SparkSession, path: str) -> BigramKN:
    """Load a persisted model; a missing meta file means the model is
    absent or torn — fail loudly rather than score with a partial
    model."""
    meta_path = os.path.join(path, _LM_META)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"no LM meta at {meta_path} — model absent or torn (a crash "
            "mid-lm_write leaves no meta by design); retrain."
        )
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("order") != 2:
        raise ValueError(f"unsupported LM order {meta.get('order')}")
    dfs = {
        name: spark.read.parquet(os.path.join(path, name))
        for name in _LM_SUBTABLES
    }
    # D == 1.0 is the valid all-mass-backs-off corner (the Ney estimate
    # hits it when n2 == 0) — train_bigram_kn accepts it and lm_write
    # persists it, so the read-side guard must too (same bound as
    # lm3_read); only out-of-range or non-finite values are corrupt
    if not (0.0 <= float(meta["discount"]) <= 1.0) or not math.isfinite(
        float(meta["discount"])
    ):
        raise ValueError(f"corrupt LM meta: discount={meta['discount']}")
    return BigramKN(
        vocab=dfs["vocab"],
        bigrams=dfs["bigrams"],
        contexts=dfs["contexts"],
        continuation=dfs["continuation"],
        n_types=int(meta["n_types"]),
        vocab_size=int(meta["vocab_size"]),
        discount=float(meta["discount"]),
        min_count=int(meta["min_count"]),
    )


# ------------------------------------------------------------ trigram KN
def _triples(toks: Column) -> Column:
    """(u, v, w) trigram triples as array algebra inside the scan:
    double-BOS padding, so token i's context is (toks[i-2], toks[i-1])
    with BOS filling the left edge — same no-window discipline as
    _pairs."""
    return F.transform(
        toks,
        lambda w, i: F.struct(
            F.when(i <= F.lit(1), F.lit(BOS))
            .otherwise(F.element_at(toks, i - 1))
            .alias("u"),
            F.when(i == F.lit(0), F.lit(BOS))
            .otherwise(F.element_at(toks, i))
            .alias("v"),
            w.alias("w"),
        ),
    )


@column_template
def _triples_named(name: str) -> Column:
    """_triples over a token-array column name — memoized template."""
    return _triples(F.col(name))


@column_template
def _triples_tokens(text_col: str) -> Column:
    """_triples over lm_tokens(text_col) — memoized template."""
    return _triples(lm_tokens(text_col))


@dataclass
class TrigramKN:
    """Interpolated trigram Kneser-Ney (Chen & Goodman 1999 — the
    public formulation): the highest order uses raw counts, the
    middle order uses CONTINUATION counts (distinct left-extensions
    of each bigram type), the lowest is the unigram continuation
    distribution — each with its own Ney-Essen-Kneser discount.
    All tables are type-sized; same scale shape as BigramKN."""

    vocab: DataFrame  # (w)
    tri: DataFrame  # (u, v, w, cnt)          raw trigram counts
    ctx3: DataFrame  # (u, v, cnt_uv, n_succ3)
    cont2: DataFrame  # (v, w, ckn)           distinct u per (v, w)
    ctx2: DataFrame  # (v, ckn_v, n_succ2)
    cont1: DataFrame  # (w, n_prec)           distinct v per bigram type
    n_bitypes: int  # distinct bigram types
    vocab_size: int
    d3: float
    d2: float
    min_count: int

    def unpersist(self) -> None:
        for df in (self.vocab, self.tri, self.cont2):
            try:
                df.unpersist()
            except Exception:
                pass


def train_trigram_kn(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    d3: float | None = None,
    d2: float | None = None,
    persist: bool = True,
) -> TrigramKN:
    """Fit the trigram model in ONE corpus scan (r12; previously two)
    and type-sized aggregates throughout: the raw (unmapped)
    triple-count type table is built first, and the vocabulary derives
    from it — every token appears exactly ONCE as the ``w`` of exactly
    one triple (``_triples`` emits one struct per token; BOS only ever
    pads the context side), so unigram counts are exactly ``sum(cnt)
    group by w_raw`` over the raw type table, no second corpus pass.
    The unk-mapping joins then run against the TYPE table instead of
    the position-level stream and re-aggregate (the mapping collapses
    rare keys into UNK) — counts bit-identical to the two-scan form by
    construction; ``persist=False`` keeps the historical uncached
    two-scan shape. The middle order's counts are CONTINUATION counts
    (how many distinct contexts extend each bigram type left), which
    is what distinguishes Kneser-Ney from naive deleted interpolation
    — computed as one aggregate over the trigram TYPE table, as
    before."""
    toks = lm_tokens(text_col)
    # the training scan gets the scorer's cost-gated fan-out: the
    # explode + per-gram partial-aggregate stage is as CPU-dense as
    # scoring, and a single-row-group parquet source otherwise pins it
    # to ONE core (measured: 2.5 s single-task stage at sf0.1). All
    # training outputs are grouping aggregates, so the round-robin
    # partitioning cannot change any count.
    src = spread_for_kernel(
        df.select(text_col), bytes_per_task=_LM_SCORE_BYTES_PER_TASK
    )
    # no empty-doc filter here: explode() of an empty (or NULL) token
    # array already emits zero rows, and an explicit size()>0 filter
    # gets PUSHED BELOW the fan-out exchange by the optimizer, which
    # re-tokenizes the whole corpus inside the single-split scan stage
    # (measured: 2.3 s single-task stage) — the exact starvation the
    # fan-out exists to remove.
    base = src.select(toks.alias("__toks__"))

    def _keep(d: DataFrame) -> DataFrame:
        return d.persist() if persist else d

    raw3 = base.select(F.explode(_triples_named("__toks__")).alias("t")).select(
        F.col("t.u").alias("u_raw"),
        F.col("t.v").alias("v_raw"),
        F.col("t.w").alias("w_raw"),
    )
    raw = raw3.groupBy("u_raw", "v_raw", "w_raw").agg(
        F.count(F.lit(1)).alias("rcnt")
    )
    if persist:
        raw = raw.persist()
    uni = raw.groupBy(F.col("w_raw").alias("w")).agg(F.sum("rcnt").alias("cnt"))
    vocab = _keep(uni.filter(F.col("cnt") >= min_count).select("w"))

    vu = vocab.select(F.col("w").alias("__vu__"))
    vv = vocab.select(F.col("w").alias("__vv__"))
    vw = vocab.select(F.col("w").alias("__vw__"))
    mapped = (
        raw.join(F.broadcast(vu), F.col("u_raw") == F.col("__vu__"), "left")
        .join(F.broadcast(vv), F.col("v_raw") == F.col("__vv__"), "left")
        .join(F.broadcast(vw), F.col("w_raw") == F.col("__vw__"), "left")
        .select(
            F.when(F.col("u_raw") == BOS, F.lit(BOS))
            .otherwise(F.coalesce(F.col("__vu__"), F.lit(UNK)))
            .alias("u"),
            F.when(F.col("v_raw") == BOS, F.lit(BOS))
            .otherwise(F.coalesce(F.col("__vv__"), F.lit(UNK)))
            .alias("v"),
            F.coalesce(F.col("__vw__"), F.lit(UNK)).alias("w"),
            F.col("rcnt"),
        )
    )
    tri = _keep(mapped.groupBy("u", "v", "w").agg(F.sum("rcnt").alias("cnt")))
    ctx3 = tri.groupBy("u", "v").agg(
        F.sum("cnt").alias("cnt_uv"), F.count(F.lit(1)).alias("n_succ3")
    )
    cont2 = _keep(
        tri.groupBy("v", "w").agg(F.count(F.lit(1)).alias("ckn"))
    )
    ctx2 = cont2.groupBy("v").agg(
        F.sum("ckn").alias("ckn_v"), F.count(F.lit(1)).alias("n_succ2")
    )
    cont1 = cont2.groupBy("w").agg(F.count(F.lit(1)).alias("n_prec"))

    # ONE action for all six training scalars (the bigram-trainer
    # discipline): three single-row aggregates cross-joined into one
    # row, one job-submission round-trip
    st = (
        tri.agg(
            F.count_if(F.col("cnt") == 1).alias("n1_3"),
            F.count_if(F.col("cnt") == 2).alias("n2_3"),
        )
        .crossJoin(
            cont2.agg(
                F.count(F.lit(1)).alias("n_bitypes"),
                F.count_if(F.col("ckn") == 1).alias("n1_2"),
                F.count_if(F.col("ckn") == 2).alias("n2_2"),
            )
        )
        .crossJoin(vocab.agg(F.count(F.lit(1)).alias("vsize")))
        .head()
    )
    # the stats action has fully materialized the persisted vocab,
    # tri, and cont2 tables; release the raw type table's blocks
    if persist:
        try:
            raw.unpersist()
        except Exception:
            pass
    vocab_size = st["vsize"]
    if d3 is None:
        d3 = st["n1_3"] / (st["n1_3"] + 2 * st["n2_3"]) if (st["n1_3"] + 2 * st["n2_3"]) > 0 else 0.75
    if d2 is None:
        d2 = st["n1_2"] / (st["n1_2"] + 2 * st["n2_2"]) if (st["n1_2"] + 2 * st["n2_2"]) > 0 else 0.75
    for name, d in (("d3", d3), ("d2", d2)):
        # D == 1 is valid KN (all observed mass discounts away and the
        # order backs off entirely — conservation still holds since
        # max(c-D, 0) >= 0); the Ney estimate hits it when n2 == 0
        if not (0.0 <= d <= 1.0):
            raise ValueError(f"{name} must be in [0, 1], got {d}")
    return TrigramKN(
        vocab=vocab,
        tri=tri,
        ctx3=ctx3,
        cont2=cont2,
        ctx2=ctx2,
        cont1=cont1,
        n_bitypes=st["n_bitypes"],
        vocab_size=vocab_size,
        d3=float(d3),
        d2=float(d2),
        min_count=min_count,
    )


def perplexity3(
    df: DataFrame,
    lm: TrigramKN,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
    out_tokens: str = "n_tokens",
    out_logprob: str = "logprob",
    out_ppl: str = "ppl",
) -> DataFrame:
    """Score documents under the trigram model: the interpolated-KN
    recursion (depth 3) as one nested CASE over five broadcast model
    joins; still a single document-keyed shuffle (the per-doc sum).
    Unseen (u, v) context backs off to the KN bigram, unseen v to
    the unigram continuation, with the same deterministic
    1/(vocab_size+1) floor as the bigram scorer."""
    d3, d2 = lm.d3, lm.d2
    floor = 1.0 / (lm.vocab_size + 1)

    # same scoring fan-out as perplexity (see there): the depth-3
    # probe stage is even denser per byte, and single-row-group
    # sources otherwise pin it to one core
    src = spread_for_kernel(
        df.select(id_col, text_col), bytes_per_task=_LM_SCORE_BYTES_PER_TASK
    )
    trips = src.select(
        F.col(id_col), F.explode(_triples_tokens(text_col)).alias("t")
    ).select(
        id_col,
        F.col("t.u").alias("u_raw"),
        F.col("t.v").alias("v_raw"),
        F.col("t.w").alias("w_raw"),
    )
    vu = lm.vocab.select(F.col("w").alias("__vu__"))
    vv = lm.vocab.select(F.col("w").alias("__vv__"))
    vw = lm.vocab.select(F.col("w").alias("__vw__"))
    mb = lambda t: _maybe_broadcast(t, broadcast_model)  # noqa: E731
    mapped = (
        trips.join(mb(vu), F.col("u_raw") == F.col("__vu__"), "left")
        .join(mb(vv), F.col("v_raw") == F.col("__vv__"), "left")
        .join(mb(vw), F.col("w_raw") == F.col("__vw__"), "left")
        .select(
            id_col,
            F.when(F.col("u_raw") == BOS, F.lit(BOS))
            .otherwise(F.coalesce(F.col("__vu__"), F.lit(UNK)))
            .alias("u"),
            F.when(F.col("v_raw") == BOS, F.lit(BOS))
            .otherwise(F.coalesce(F.col("__vv__"), F.lit(UNK)))
            .alias("v"),
            F.coalesce(F.col("__vw__"), F.lit(UNK)).alias("w"),
        )
    )
    joined = (
        mapped.join(mb(lm.tri), ["u", "v", "w"], "left")
        .join(mb(lm.ctx3), ["u", "v"], "left")
        .join(mb(lm.cont2), ["v", "w"], "left")
        .join(mb(lm.ctx2), ["v"], "left")
        .join(mb(lm.cont1), ["w"], "left")
    )
    p_cont_raw = F.coalesce(F.col("n_prec"), F.lit(0)) / F.lit(lm.n_bitypes)
    p_cont = F.when(p_cont_raw > 0, p_cont_raw).otherwise(F.lit(floor))
    p_kn2 = F.when(F.col("ckn_v").isNull(), p_cont).otherwise(
        F.greatest(F.coalesce(F.col("ckn"), F.lit(0)) - F.lit(d2), F.lit(0.0))
        / F.col("ckn_v")
        + (F.lit(d2) * F.col("n_succ2") / F.col("ckn_v")) * p_cont
    )
    p_raw = F.when(F.col("cnt_uv").isNull(), p_kn2).otherwise(
        F.greatest(F.coalesce(F.col("cnt"), F.lit(0)) - F.lit(d3), F.lit(0.0))
        / F.col("cnt_uv")
        + (F.lit(d3) * F.col("n_succ3") / F.col("cnt_uv")) * p_kn2
    )
    # same D == 0 total-score floor as the bigram scorer: with d3 == 0
    # (or d2 == 0 one level down) an unseen n-gram under a seen context
    # yields p == 0 and log(0) is NULL, silently skipped by sum() —
    # floor the FINAL probability once (p_kn2 can only be 0 when its
    # own seen branch is, so one floor at the top covers both levels;
    # for d3, d2 > 0 it never fires and the expression is
    # value-identical)
    p = F.when(p_raw > F.lit(0.0), p_raw).otherwise(F.lit(floor))
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias(out_tokens), F.sum(F.log(p)).alias(out_logprob)
    )
    return (
        df.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            id_col,
            F.coalesce(F.col(out_tokens), F.lit(0)).alias(out_tokens),
            F.col(out_logprob),
            F.when(
                F.col(out_tokens) > 0,
                F.exp(-F.col(out_logprob) / F.col(out_tokens)),
            ).alias(out_ppl),
        )
    )


_LM3_SUBTABLES = ("vocab", "tri", "ctx3", "cont2", "ctx2", "cont1")


def lm3_write(lm: TrigramKN, path: str) -> None:
    """Persist the trigram model — six parquet subtables plus a meta
    file, same retire-first/write-last discipline as lm_write (a
    crash mid-write leaves a visibly-torn model, never a stale
    one)."""
    meta_path = os.path.join(path, _LM_META)
    if os.path.exists(meta_path):
        os.remove(meta_path)
    for name in _LM3_SUBTABLES:
        getattr(lm, name).write.mode("overwrite").parquet(
            os.path.join(path, name)
        )
    meta = {
        "n_bitypes": lm.n_bitypes,
        "vocab_size": lm.vocab_size,
        "d3": lm.d3,
        "d2": lm.d2,
        "min_count": lm.min_count,
        "order": 3,
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)


def lm3_read(spark: SparkSession, path: str) -> TrigramKN:
    """Load a persisted trigram model; missing meta = absent or torn,
    fail loudly (mirrors lm_read)."""
    meta_path = os.path.join(path, _LM_META)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"no LM meta at {meta_path} — model absent or torn (a crash "
            "mid-lm3_write leaves no meta by design); retrain."
        )
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("order") != 3:
        raise ValueError(
            f"LM at {path} has order {meta.get('order')}, not 3 — use "
            "lm_read for bigram models."
        )
    for name, d in (("d3", meta["d3"]), ("d2", meta["d2"])):
        if not (0.0 <= float(d) <= 1.0) or not math.isfinite(float(d)):
            raise ValueError(f"corrupt LM meta: {name}={d}")
    dfs = {
        name: spark.read.parquet(os.path.join(path, name))
        for name in _LM3_SUBTABLES
    }
    return TrigramKN(
        vocab=dfs["vocab"],
        tri=dfs["tri"],
        ctx3=dfs["ctx3"],
        cont2=dfs["cont2"],
        ctx2=dfs["ctx2"],
        cont1=dfs["cont1"],
        n_bitypes=int(meta["n_bitypes"]),
        vocab_size=int(meta["vocab_size"]),
        d3=float(meta["d3"]),
        d2=float(meta["d2"]),
        min_count=int(meta["min_count"]),
    )
