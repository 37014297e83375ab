"""Mergeable sketches: HyperLogLog-style distinct, count-min
frequency, and fixed-bin histogram quantiles.

At 100 TB, exact ``COUNT(DISTINCT x)`` is a full shuffle of every
distinct value and exact quantiles are a global sort; the sketches
here replace both with **fixed-size, mergeable state** that Spark's
partial aggregation combines map-side:

- ``hll_*``   — 2^p max-rho registers (p=8 → 256 longs, ~2 KB). Each
  input partition folds locally into its own register vector (the
  ``max`` partial-agg); the shuffle moves only ``m`` rows per
  partition, never the data. Register tables from different days /
  sources / tables merge by elementwise max (``hll_merge``), which is
  the property that makes the sketch incremental: a 100 TB corpus can
  keep per-partition register parquet and answer cardinality over any
  subset by a 256-row union.
- ``cms_*``   — depth×width counter matrix (4×64 here). Same story
  with ``sum`` as the merge; point lookups read ``depth`` cells.
- ``histogram_*`` — equi-width bin counts; quantile estimates come
  from the cumulative distribution with linear interpolation inside
  the hit bin. Merging histograms is vector addition.

Every hash is the first bytes of ``md5`` of the value's canonical
string — chosen over the engines' native ``hash()``/``xxhash64``
because md5 is bit-identical across Spark, DuckDB, and any other
engine a user would validate against, which lets the test suite
hash-compare the DISTRIBUTED sketch against an independent
single-node build (suite/sketches.py). Determinism beats speed in
the hash here; the md5 is one codegen'd JVM call per row either way.

Bit extraction is done on the hex string (not numeric conversion) so
both engines provably run the identical integer math:

- register index = first 2 hex chars (8 bits, 0..255)
- rho (HLL)      = 1 + leading zero BITS of the next 13 hex chars
  (52 bits — chosen because 52-bit integers are also exact in
  doubles, keeping every engine's arithmetic path exact), computed as
  4×(leading '0' chars) + a 16-way CASE on the first non-zero char
- cms bucket i   = the 2-hex-char window at chars 2i+1..2i+2 of ONE
  md5 digest, mod width (d independent byte windows of one digest
  serve as the d hash rows; one md5 per input row total).

The HLL harmonic sum is kept in INTEGER space: sum of
``2^(53 - rho)`` as a long (max 256·2^53 < 2^62), so no
floating-point summation-order hazard exists between engines; the
single final division happens once, in one double op.

Reference parity: the reference engine has no sketches (its scale
never needed them — R/mfdb-workspace.R materializes exact counts);
this module is extension scope from the driver brief ("a novel
sketch"), mirroring the shapes of Apache DataSketches' HLL / CMS as
published (Flajolet et al. 2007; Cormode & Muthukrishnan 2005).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from mfdb_hafro_etl_spark.localrel import local_df

# 52 bits of rho material: exact in BIGINT *and* DOUBLE on every engine.
_RHO_HEX_CHARS = 13
_RHO_MAX = 4 * _RHO_HEX_CHARS + 1  # all-zero tail ⇒ rho = 53


def _hll_alpha(m: int) -> float:
    # classic bias constant; written as the formula (not a rounded
    # literal) so the oracle SQL can spell the identical expression
    return 0.7213 / (1.0 + 1.079 / m)


def _hex2int_2chars(col: Column, pos: int) -> Column:
    """Value of a 2-hex-char window as 0..255 via strpos math (the
    form the DuckDB oracle mirrors verbatim)."""
    digits = "0123456789abcdef"
    c1 = F.substring(col, pos, 1)
    c2 = F.substring(col, pos + 1, 1)
    return (F.instr(F.lit(digits), c1) - 1) * 16 + (F.instr(F.lit(digits), c2) - 1)


# --------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------


def hll_register_table(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """Dense register table ``(idx, rho)`` — ALL 2^p rows, empty
    registers at rho=0 — from one groupBy(idx).max(rho).

    The groupBy is the entire distributed cost: partial max folds each
    input partition to ≤ m rows map-side, so the shuffle is O(m ×
    n_partitions) regardless of data size. The dense completion is a
    broadcast join against a generated 2^p-row spine.
    """
    if p != 8:
        raise ValueError("p=8 (256 registers) is the pinned layout; the hex-window index reads exactly 2 chars")
    m = 1 << p
    h = F.md5(F.col(col).cast("string"))
    tail = F.substring(h, 3, _RHO_HEX_CHARS)
    rho = (
        F.when(
            F.length(F.regexp_extract(tail, "^(0*)", 1)) == _RHO_HEX_CHARS,
            F.lit(_RHO_MAX),
        ).otherwise(
            F.length(F.regexp_extract(tail, "^(0*)", 1)) * 4
            + _nibble_lz_after_zeros(tail)
            + 1
        )
    ).cast("int")
    observed = (
        df.select(
            _hex2int_2chars(h, 1).cast("int").alias("idx"),
            rho.alias("rho"),
        )
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )
    spine = df.sparkSession.range(m).select(F.col("id").cast("int").alias("idx"))
    return (
        spine.join(F.broadcast(observed), "idx", "left")
        .select("idx", F.coalesce("rho", F.lit(0)).alias("rho"))
    )


def _nibble_lz_after_zeros(tail: Column) -> Column:
    first = F.substring(
        F.concat(tail, F.lit("x")),
        F.length(F.regexp_extract(tail, "^(0*)", 1)) + 1,
        1,
    )
    return (
        F.when(first.isin("8", "9", "a", "b", "c", "d", "e", "f"), F.lit(0))
        .when(first.isin("4", "5", "6", "7"), F.lit(1))
        .when(first.isin("2", "3"), F.lit(2))
        .otherwise(F.lit(3))  # '1'
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge register tables by elementwise max — the operation that
    makes the sketch incremental/distributive."""
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy("idx").agg(F.max("rho").alias("rho"))


def hll_estimate_from_registers(registers: DataFrame, p: int = 8) -> DataFrame:
    """One-row ``(m, n_zero, est_distinct)`` from a dense register
    table. Harmonic sum stays integral (sum of 2^(53-rho) longs);
    the one double division happens at the end.
    """
    m = 1 << p
    alpha = _hll_alpha(m)
    pow53 = float(1 << 53)
    agg = registers.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - rho)")).alias("s_int"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("n_zero"),
    )
    raw = F.lit(alpha * m * m * pow53) / F.col("s_int").cast("double")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero").cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0), small).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("n_zero").cast("int").alias("n_zero"),
        F.round(est, 2).alias("est_distinct"),
    )


def hll_estimate(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """Approximate COUNT(DISTINCT col) in one fixed-size aggregation."""
    return hll_estimate_from_registers(hll_register_table(df, col, p), p)


def hll_estimate_by(df: DataFrame, group_cols: list[str], col: str, p: int = 8) -> DataFrame:
    """Per-group approximate distinct: ``(…group_cols, n_zero,
    est_distinct)``.

    The exact equivalent (groupBy(keys).agg(countDistinct)) shuffles
    every distinct (key, value) pair; this shuffles ≤ m rows per key
    per partition. Dense registers per group come from a
    group-spine × range(m) cross (|G|·m rows — dimension-sized).
    """
    if p != 8:
        raise ValueError("p=8 is the pinned layout")
    m = 1 << p
    h = F.md5(F.col(col).cast("string"))
    tail = F.substring(h, 3, _RHO_HEX_CHARS)
    rho = (
        F.when(
            F.length(F.regexp_extract(tail, "^(0*)", 1)) == _RHO_HEX_CHARS,
            F.lit(_RHO_MAX),
        ).otherwise(
            F.length(F.regexp_extract(tail, "^(0*)", 1)) * 4
            + _nibble_lz_after_zeros(tail)
            + 1
        )
    ).cast("int")
    observed = (
        df.select(
            *group_cols,
            _hex2int_2chars(h, 1).cast("int").alias("idx"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )
    groups = df.select(*group_cols).distinct()
    spine = groups.crossJoin(
        F.broadcast(df.sparkSession.range(m).select(F.col("id").cast("int").alias("idx")))
    )
    dense = spine.join(observed, [*group_cols, "idx"], "left").select(
        *group_cols, "idx", F.coalesce("rho", F.lit(0)).alias("rho")
    )
    alpha = _hll_alpha(m)
    pow53 = float(1 << 53)
    agg = dense.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - rho)")).alias("s_int"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("n_zero"),
    )
    raw = F.lit(alpha * m * m * pow53) / F.col("s_int").cast("double")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero").cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0), small).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("n_zero").cast("int").alias("n_zero"),
        F.round(est, 2).alias("est_distinct"),
    )


# --------------------------------------------------------------------
# Count-min sketch
# --------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64  # power of two ≤ 256 so the low-byte mod trick is exact


def _cms_bucket_array(h: Column) -> Column:
    """All DEPTH buckets of one md5 digest: sketch row i reads the
    disjoint 2-hex-char window at chars 2i+1..2i+2 (md5 bytes are
    uniform and independent, so d windows of ONE digest serve as the
    d hash functions — one hash per row instead of d, which is the
    difference between 0.6 s and 3.6 s per million rows)."""
    return F.array(
        *[(_hex2int_2chars(h, 2 * i + 1) % CMS_WIDTH).cast("int") for i in range(CMS_DEPTH)]
    )


def cms_sketch(df: DataFrame, col: str, weight: str | None = None) -> DataFrame:
    """Count-min counter matrix ``(row, bucket, cnt)`` — DEPTH×WIDTH
    rows total. One md5 per input row, one posexplode(depth) + one
    groupBy; partial sums keep the shuffle at ≤ depth·width rows per
    partition."""
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    hashed = df.select(
        F.md5(F.col(col).cast("string")).alias("_h"), w.alias("_w")
    )
    exploded = hashed.select(
        F.posexplode(_cms_bucket_array(F.col("_h"))).alias("row", "bucket"),
        "_w",
    )
    return (
        exploded.groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_point_estimate(sketch: DataFrame, probes: DataFrame, probe_col: str) -> DataFrame:
    """Point frequency upper bound per probe key: min over rows of the
    probed cell. ``probes`` is dimension-sized (broadcast)."""
    probe_cells = (
        probes.select(
            F.col(probe_col).alias("probe"),
            F.md5(F.col(probe_col).cast("string")).alias("_h"),
        )
        .select(
            "probe",
            F.posexplode(_cms_bucket_array(F.col("_h"))).alias("row", "bucket"),
        )
    )
    return (
        F.broadcast(probe_cells)
        .join(sketch, ["row", "bucket"], "left")
        .groupBy("probe")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_cnt"))
    )


# --------------------------------------------------------------------
# Histogram quantiles
# --------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Equi-width bin counts ``(bin, cnt)`` over [lo, hi); values are
    clamped into the edge bins. Fixed-size mergeable state (vector
    add)."""
    width = (hi - lo) / nbins
    x = F.col(col).cast("double")
    b = F.floor((x - F.lit(lo)) / F.lit(width)).cast("int")
    b = F.least(F.lit(nbins - 1), F.greatest(F.lit(0), b))
    return df.select(b.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
    qs: list[float],
) -> DataFrame:
    """Quantile estimates ``(q, est)`` by linear interpolation inside
    the cumulative histogram.

    target = q·n ranks into the cumulative counts; the estimate
    interpolates within the first bin whose cumulative count reaches
    the target. All inputs to the one float expression (bin edges,
    counts, q) are exact, so engines agree bit-for-bit.
    """
    from pyspark.sql import Window

    width = (hi - lo) / nbins
    hist = histogram_sketch(df, col, lo, hi, nbins)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
    ).withColumn("cum_prev", F.col("cum") - F.col("cnt"))
    total = hist.agg(F.sum("cnt").alias("n"))
    qdf = local_df(df.sparkSession, [(float(q),) for q in qs], "q double")
    # the histogram is ≤ nbins rows: broadcast everything
    hit = (
        F.broadcast(qdf)
        .crossJoin(F.broadcast(total))
        .join(
            F.broadcast(cum),
            (F.col("cum") >= F.col("q") * F.col("n"))
            & (F.col("cum_prev") < F.col("q") * F.col("n")),
        )
    )
    est = (
        F.lit(lo)
        + F.col("bin").cast("double") * F.lit(width)
        + F.lit(width)
        * (F.col("q") * F.col("n") - F.col("cum_prev"))
        / F.col("cnt").cast("double")
    )
    return hit.select("q", F.round(est, 4).alias("est"))


# --------------------------------------------------------------------
# KMV (k minimum values / theta) sketch — set-operation cardinality
# --------------------------------------------------------------------

KMV_K = 256
# 13 hex chars = 52 bits: the largest window exact in BIGINT and DOUBLE
_KMV_HEX_CHARS = 13
_KMV_SPACE = float(1 << 52)


def kmv_sketch(df: DataFrame, col: str) -> DataFrame:
    """The k smallest distinct md5 values of ``col`` as ``(h)`` hex
    strings — a KMV/theta sketch.

    Fixed-length lowercase hex sorts identically to its numeric value,
    so ``ORDER BY h LIMIT k`` IS the k-minimum-values selection, and
    Spark plans it as TakeOrderedAndProject: each partition retains
    only its local k, the driver merges k·n_partitions candidates —
    no global sort, no full shuffle. Unlike HLL, KMV sketches support
    set INTERSECTION estimates (kmv_set_estimates), because the
    retained hash sample is a uniform sample of the distinct universe
    below theta.
    """
    h = F.md5(F.col(col).cast("string")).alias("h")
    return df.select(h).distinct().orderBy("h").limit(KMV_K)


def kmv_estimate(sketch: DataFrame) -> DataFrame:
    """(k, est_distinct) from one KMV sketch: (k-1) / theta_frac."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("k"),
        F.max(F.expr(f"CAST(conv(substr(h, 1, {_KMV_HEX_CHARS}), 16, 10) AS BIGINT)")).alias(
            "theta_int"
        ),
    )
    est = (
        (F.col("k") - 1).cast("double")
        * F.lit(_KMV_SPACE)
        / F.col("theta_int").cast("double")
    )
    return agg.select("k", F.round(est, 2).alias("est_distinct"))


def kmv_set_estimates(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union / intersection distinct estimates from two KMV sketches.

    theta = k-th smallest of the MERGED hash set; every retained hash
    below theta is a uniform sample of the distinct union, so
    |union| ≈ k_u / theta_frac and |intersection| ≈ (matches below
    theta) / theta_frac. Both sketches are ≤ k rows — the whole
    computation is driver-scale regardless of input size.
    """
    merged = a.unionByName(b).distinct().orderBy("h").limit(KMV_K)
    theta = merged.agg(
        F.max(F.expr(f"CAST(conv(substr(h, 1, {_KMV_HEX_CHARS}), 16, 10) AS BIGINT)")).alias(
            "theta_int"
        ),
        F.count(F.lit(1)).alias("k_u"),
    )
    inter = (
        a.join(b, "h")
        .crossJoin(F.broadcast(theta))
        .filter(
            F.expr(f"CAST(conv(substr(h, 1, {_KMV_HEX_CHARS}), 16, 10) AS BIGINT)")
            <= F.col("theta_int")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    est_u = (
        (F.col("k_u") - 1).cast("double")
        * F.lit(_KMV_SPACE)
        / F.col("theta_int").cast("double")
    )
    est_i = (
        F.col("n_common").cast("double")
        * F.lit(_KMV_SPACE)
        / F.col("theta_int").cast("double")
    )
    return (
        theta.crossJoin(inter)
        .select(
            F.col("k_u").cast("int").alias("k_u"),
            F.col("n_common").cast("int").alias("n_common"),
            F.round(est_u, 2).alias("est_union"),
            F.round(est_i, 2).alias("est_intersection"),
        )
    )
