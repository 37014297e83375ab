"""Similarity search over embedding columns (array<float>).

Driver extension scope (no reference counterpart). Two paths:

- brute-force cosine top-k — the exactness baseline: one narrow map
  (dot products against a broadcast query vector) + TakeOrdered.
  At 100 TB this is a full scan but NO shuffle: the query vector is
  a literal, the top-k is a treeReduce.
- LSH-bucketed ANN — random-hyperplane signs (deterministically
  derived from md5, no RNG) bucket vectors; the query only scans its
  own bucket. The scale path: bucket count grows 2^planes, the scan
  per query drops proportionally; buckets are a plain partition key.

Kernels are pure Column algebra (zip_with + aggregate) — JVM-side,
no Python per row.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # cast to double FIRST so per-element products are computed in
    # double precision (matches the SQL oracle's ::DOUBLE[] path;
    # float-precision products would diverge in the 7th decimal)
    ad, bd = a.cast("array<double>"), b.cast("array<double>")
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    ad = a.cast("array<double>")
    return F.sqrt(
        F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.
    Returns (id, cos_sim) with deterministic tie-break on id.
    cos_sim rounded to 6 for engine-portable comparison."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = emb.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim")
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: all (a,b), a<b, with cosine ≥
    threshold.

    Implemented as a blocked matrix product: the normalized matrix is
    broadcast once; each partition multiplies its row block against
    it with numpy (BLAS) inside mapInPandas and emits only pairs over
    the threshold. ~50× the throughput of the per-pair Column-algebra
    fold (which re-evaluates two 64-element norms per pair).

    Scale path: the broadcast side must fit executor memory (N×dim
    float64). Beyond that, pre-bucket with lsh_bucket() and run this
    within buckets, or block both sides (grid cross-join of row
    ranges).
    """
    import numpy as np
    import pandas as pd

    from mfdb_hafro_etl_spark.session import ensure_package_shipped

    ensure_package_shipped(emb.sparkSession)

    rows = emb.select(F.col(id_col), F.col(vec_col)).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Mn = M / norms
    spark = emb.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(Mn)

    def gen(batches):
        all_ids, mat = b_ids.value, b_mat.value
        order = np.argsort(all_ids)
        for pdf in batches:
            chunk_ids = pdf[id_col].to_numpy(dtype=np.int64)
            pos = order[np.searchsorted(all_ids[order], chunk_ids)]
            sims = mat[pos] @ mat.T  # (chunk, N) BLAS product
            ia, ib = np.nonzero(
                (np.round(sims, 6) >= threshold)
                & (chunk_ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": chunk_ids[ia],
                    "id_b": all_ids[ib],
                    "cos_sim": np.round(sims[ia, ib], 6),
                }
            )

    return emb.select(id_col).mapInPandas(
        gen, schema="id_a bigint, id_b bigint, cos_sim double"
    )


def _plane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign of bit 0 of md5(p:d).
    Content-derived, no RNG — reproducible across engines/runs."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) & 1 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit p = (dot(v, plane_p) > 0)."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        parr = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec_col, parr) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH
    bucket. dim inferred from the query vector."""
    planes = _plane_signs(n_planes, len(query_vec))
    qbucket = 0
    for p, plane in enumerate(planes):
        if sum(q * w for q, w in zip(query_vec, plane)) > 0:
            qbucket |= 1 << p
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    bucketed = emb.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    scored = (
        bucketed.filter(F.col("bucket") == qbucket)
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def ann_ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the clustered scale
    path beside LSH: vectors are assigned to their nearest centroid;
    a query scores only the ``n_probe`` clusters nearest its vector,
    scanning n_probe/n_centroids of the data.

    Centroids are the ``n_centroids`` lowest-id vectors — a
    deterministic "training sample" (no RNG, engine-reproducible; a
    production build would k-means-refine them, which changes recall
    but not the operator shape). Assignment is pure Column algebra:
    argmax over the broadcast centroid array via array_sort on
    (-cos, cid) structs — ties resolve to the smallest centroid id on
    both engines. Cosines are rounded to 6 before comparison so
    cross-engine ulp noise can't flip an assignment.

    At scale the assignment is a narrow map; writing the result
    partitioned by cluster id makes every later probe a partition-
    pruned scan.
    """
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in emb.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    ]
    # the assignment evaluates n_centroids array-cosines per row; a
    # single-row-group parquet input would run that on one core, so
    # fan the scan out first (explicit count — AQE must not coalesce
    # a CPU-bound stage back down)
    emb = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
    # Assignment built as ONE SQL expression with the centroid matrix
    # inline: a per-centroid F.lit build costs n_centroids·dim py4j
    # round-trips at plan time and explodes whole-stage codegen with
    # n_centroids separate cosine trees; a single transform() over a
    # literal struct array keeps the plan O(1) in n_centroids. Float
    # semantics are unchanged: the same zip_with/aggregate left-fold
    # per dot, the row norm evaluated once per row (__vnorm__), and
    # centroid norms folded in Python with the identical sequential
    # IEEE left-fold — bit-identical to the oracle's per-centroid
    # cosine.
    def _pynorm(v: list[float]) -> float:
        acc = 0.0
        for x in v:
            acc += x * x
        return acc ** 0.5

    def _dlit(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    row_norm = norm(F.col(vec_col))
    cent_structs = ",".join(
        "named_struct('cid', {cid}, 'nrm', {nrm}, 'vec', array({vec}))".format(
            cid=cid, nrm=_dlit(_pynorm(cv)), vec=",".join(_dlit(x) for x in cv)
        )
        for cid, cv in cents
    )
    assign = F.expr(
        f"""array_sort(transform(array({cent_structs}), c -> named_struct(
          'negcos', -round(
              aggregate(zip_with(cast(`{vec_col}` as array<double>), c.vec,
                                 (x, y) -> x * y),
                        cast(0.0 as double), (acc, x) -> acc + x)
              / (`__vnorm__` * c.nrm), 6),
          'cid', c.cid)))[0].cid"""
    )

    def _pycos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return round(d / (na * nb), 6)

    probes = [
        cid
        for cid, _ in sorted(cents, key=lambda c: (-_pycos(query_vec, c[1]), c[0]))[:n_probe]
    ]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = (
        emb.withColumn("__vnorm__", row_norm)
        .withColumn("__cid__", assign)
        .filter(F.col("__cid__").isin(probes))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)
