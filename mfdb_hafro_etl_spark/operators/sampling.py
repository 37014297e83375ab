"""Deterministic sampling / dataset-split operators (driver extension
scope — the train/valid/test plumbing of a training-data pipeline).

Everything is content-hash based, NOT RNG based: a row's split or
sample membership is a pure function of its id, so results are
reproducible across runs, engines, partitionings and cluster sizes —
``df.sample()``'s seed is partition-dependent and resamples when the
layout changes, which silently leaks test data across reruns at
scale. md5-derived buckets are uniform to ~2^-64 and reproducible in
ANSI SQL for the oracle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.exprcache import column_template

# 15 hex chars = 60 bits. A 60-bit integer is NOT exactly
# representable in a double (exact only to 2^53) — portability comes
# from both engines performing the SAME correctly-rounded int→double
# conversion and IEEE division, not from exactness.
_BUCKET_HEX = 15
_BUCKET_MAX = float(16 ** _BUCKET_HEX)


def hash_unit(col: Column | str, salt: str = "") -> Column:
    """Uniform [0,1) value derived from md5(salt || id) — the
    deterministic replacement for rand(seed). Engine-portable because
    conv→double rounding and the division are identical
    correctly-rounded IEEE operations in Spark and the SQL oracle.
    String names route through a memoized template (exprcache)."""
    if isinstance(col, str):
        return _hash_unit_named(col, salt)
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, _BUCKET_HEX), 16, 10).cast("double") / F.lit(_BUCKET_MAX)


@column_template
def _hash_unit_named(name: str, salt: str) -> Column:
    return hash_unit(F.col(name), salt)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Reproducible ~fraction sample: keeps rows whose hash_unit falls
    below ``fraction``. Membership is stable under repartition,
    re-run, and engine change; disjoint samples come from different
    salts."""
    return df.filter(hash_unit(id_col, salt) < fraction)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum downsampling: a row survives iff
    hash_unit(id) < rates[stratum]. The workhorse of corpus mixing —
    'keep 100% of books, 30% of web, 5% of logs' — with the same
    reproducibility guarantees as hash_split: membership is a pure
    function of (id, salt), independent of partitioning and engine.

    The rate lookup is a literal CASE expression (rates tables are
    policy-sized), so the whole operator is one codegen'd filter — no
    join, no shuffle, and the filter pushes to the scan when id and
    stratum are plain columns."""
    u = hash_unit(id_col, salt)
    rate: Column | None = None
    for name, r in rates.items():
        cond = F.col(stratum_col) == name
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = F.lit(default_rate) if rate is None else rate.otherwise(F.lit(default_rate))
    return df.filter(u < rate)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Mapping[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test assignment: cumulative
    hash_unit boundaries in the given order. Fractions must sum to
    1.0; every row lands in exactly one split, forever — the property
    that keeps held-out data held out across pipeline reruns."""
    splits = dict(splits or {"train": 0.98, "valid": 0.01, "test": 0.01})
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    u = hash_unit(id_col, salt)
    expr: Column | None = None
    names = list(splits)
    # cumulative boundaries via fsum of the prefix — repeated float
    # adds drift (0.8 + 0.1 = 0.9000000000000001), which would open a
    # ~1e-16 window where the engine boundary disagrees with the
    # documented/oracle literal (e.g. 0.9)
    import math

    for i, name in enumerate(names[:-1]):
        acc = math.fsum(splits[n] for n in names[: i + 1])
        expr = F.when(u < acc, F.lit(name)) if expr is None else expr.when(u < acc, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def per_group_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic k-per-group sample — the distributed,
    reproducible replacement for per-group reservoir sampling: rank
    rows within each group by hash_unit(id) (id as tie-break for the
    measure-zero hash-collision case) and keep the k smallest.

    Scale shape: ONE window pass over the group partitioning — no
    collect, no per-group loop; at 100 TB this is a single shuffle
    on the group key, and skewed groups cost what any windowed
    top-k costs (AQE skew handling applies). Membership is a pure
    function of (id, salt) ∩ group top-k, so adding rows to a group
    only evicts the largest-hash members — the stable-under-append
    property reservoir sampling is used for."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(hash_unit(id_col, salt).asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    max_len: int,
    salt: str = "",
    buckets: int = 1024,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style batch
    assembly step: order documents deterministically, lay their
    tokens end-to-end, and cut the stream into fixed ``max_len``
    chunks. A document that straddles a cut is split across the two
    sequences (exactly what training pipelines do; no padding waste,
    no bin-packing search). Returns one row per (doc, sequence) span:

        (id, seq_id, doc_offset, seq_offset, span_len)

    where ``doc_offset`` is the span's start within the document and
    ``seq_offset`` its start within the sequence; spans of a doc
    reassemble the doc, spans of a seq_id fill [0, max_len) exactly
    (last sequence excepted).

    Scale shape — the global running offset is a DISTRIBUTED PREFIX
    SUM, not a single-partition window: docs are ordered by
    (hash-bucket, hash, id); pass 1 computes the within-bucket
    cumulative sum (window partitioned by bucket — parallel) plus
    per-bucket totals (``buckets`` rows, dimension-sized); pass 2
    broadcasts the buckets' exclusive prefix totals back as the
    bucket base offset. One shuffle + one broadcast join; no task
    ever sees more than its bucket. The deterministic hash order
    also acts as the shuffle step's document-level shuffling (a
    training-data requirement), reproducible across engines/runs.
    """
    from pyspark.sql import Window

    u = hash_unit(id_col, salt)
    base = df.select(F.col(id_col), F.col(len_col).cast("long").alias("__len__")).filter(
        F.col("__len__") > 0
    )
    withb = base.withColumn("__u__", u).withColumn(
        "__b__", F.floor(F.col("__u__") * buckets).cast("int")
    )
    wb = Window.partitionBy("__b__").orderBy("__u__", id_col)
    local = withb.withColumn(
        "__local_end__", F.sum("__len__").over(wb)
    )
    totals = (
        withb.groupBy("__b__").agg(F.sum("__len__").alias("__btot__"))
    )
    wtot = Window.orderBy("__b__").rowsBetween(Window.unboundedPreceding, -1)
    # buckets-count rows: the tiny global window runs on the
    # dimension-sized totals table, never on the corpus
    offsets = totals.withColumn(
        "__base__", F.coalesce(F.sum("__btot__").over(wtot), F.lit(0))
    ).select("__b__", "__base__")
    placed = local.join(F.broadcast(offsets), on="__b__").select(
        F.col(id_col),
        F.col("__len__"),
        (F.col("__base__") + F.col("__local_end__") - F.col("__len__")).alias("__start__"),
    )
    end = F.col("__start__") + F.col("__len__")
    first_chunk = F.floor(F.col("__start__") / max_len).cast("long")
    last_chunk = F.floor((end - 1) / max_len).cast("long")
    spans = placed.select(
        F.col(id_col),
        F.col("__len__"),
        F.col("__start__"),
        F.explode(F.sequence(first_chunk, last_chunk)).alias("seq_id"),
    )
    chunk_lo = F.col("seq_id") * max_len
    span_lo = F.greatest(F.col("__start__"), chunk_lo)
    span_hi = F.least(F.col("__start__") + F.col("__len__"), chunk_lo + max_len)
    return spans.select(
        F.col(id_col),
        F.col("seq_id"),
        (span_lo - F.col("__start__")).alias("doc_offset"),
        (span_lo - chunk_lo).alias("seq_offset"),
        (span_hi - span_lo).alias("span_len"),
    )


def temperature_rates(
    df: DataFrame,
    source_col: str,
    temperature: float,
    target_frac: float = 1.0,
) -> dict[str, float]:
    """Per-source keep rates for temperature-based corpus mixing
    (the multilingual-sampling rule: p_s ∝ n_s^(1/T)). T=1 keeps the
    natural distribution; T→∞ equalizes sources; ``target_frac``
    scales the expected surviving fraction of the whole corpus.

    rate_s = min(1, target_frac · N · (w_s / Z) / n_s),
    w_s = n_s^(1/T), Z = Σ w_s — rounded HALF_UP to 6dp so the rate
    literals are engine-portable (an oracle recomputing them in SQL
    rounds to the same 6dp; T=2 keeps the power a correctly-rounded
    sqrt on every engine).

    One count aggregation (source cardinality is policy-sized —
    thousands at most against a 100 TB corpus); the returned dict
    feeds stratified_sample, whose CASE-literal filter is the only
    corpus-side work.
    """
    import math

    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(counts.values())
    weights = {s: float(n) ** (1.0 / temperature) for s, n in counts.items()}
    z = math.fsum(weights[s] for s in sorted(weights))
    return {
        s: math.floor(min(1.0, target_frac * n_total * (weights[s] / z) / counts[s]) * 1e6 + 0.5) / 1e6
        for s in counts
    }


def temperature_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    temperature: float,
    target_frac: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature mixing: compute per-source rates
    (temperature_rates) and keep rows via the hash-unit filter —
    membership a pure function of (id, salt), one codegen'd filter
    over the corpus, no join, no shuffle."""
    rates = temperature_rates(df, source_col, temperature, target_frac)
    return stratified_sample(df, id_col, source_col, rates, salt=salt)


def global_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "",
    buckets: int = 1024,
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic corpus-wide shuffle order — the step between a
    curated corpus and its training export (sequential-source bias is
    the classic failure a shuffled order prevents). Appends
    ``rank_col``: the row's 0-based position in the (hash_unit(salt,
    id), id) total order — reproducible across runs, repartitions,
    and engines, and disjoint orders come from different salts.

    The rank is a distributed prefix COUNT in pack_sequences' two-pass
    shape: a within-bucket row_number (window partitioned by hash
    bucket — parallel) plus broadcast per-bucket base offsets
    (``buckets`` dimension-sized rows). Never a global
    single-partition window; one shuffle + one broadcast join. To
    EXPORT in shuffle order, write sorted by ``rank_col`` (Spark's
    sort is a parallel range exchange) or feed pack_sequences, which
    embeds the same order."""
    from pyspark.sql import Window

    clash = {"__u__", "__b__", "__ln__", "__base__", "__btot__"} & set(df.columns)
    if clash:
        # withColumn silently OVERWRITES same-named inputs and the
        # temps are dropped before return — a caller's column of that
        # name would vanish with no error, so refuse loudly instead
        raise ValueError(
            f"global_shuffle uses temp column names {sorted(clash)} that "
            f"already exist in the input — rename them before shuffling."
        )
    u = hash_unit(id_col, salt)
    withb = df.withColumn("__u__", u).withColumn(
        "__b__", F.floor(F.col("__u__") * buckets).cast("int")
    )
    wb = Window.partitionBy("__b__").orderBy("__u__", id_col)
    local = withb.withColumn("__ln__", F.row_number().over(wb))
    totals = withb.groupBy("__b__").agg(F.count(F.lit(1)).alias("__btot__"))
    wtot = Window.orderBy("__b__").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__base__", F.coalesce(F.sum("__btot__").over(wtot), F.lit(0))
    ).select("__b__", "__base__")
    return (
        local.join(F.broadcast(offsets), on="__b__")
        .withColumn(rank_col, F.col("__base__") + F.col("__ln__") - 1)
        .drop("__u__", "__b__", "__ln__", "__base__")
    )
