"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one scan, fused dot product in a
single column expression (zip_with + left-fold aggregate, JVM-side), a
global top-k (orderBy + limit pushes down as TakeOrderedAndProject — no
full sort materialization).

Scale path: LSH bucketing by random-hyperplane sign bits (deterministic
pseudo-hyperplanes derived from md5 of (plane, dim) — reproducible with no
RNG state), candidates = same bucket (or Hamming-adjacent buckets),
refined exactly.  At 10^12 rows the bucket join replaces the full scan;
recall is tested against brute force in tests/test_similarity.py.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_to_query(df: DataFrame, query_vec: list[float],
                    vec_col: str = "embedding") -> DataFrame:
    """Adds ``cos`` — cosine similarity to a literal query vector.
    The whole expression is one codegen stage over the Arrow scan."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    return df.withColumn("cos", _dot(v, q) / (_norm(v) * F.lit(qn)))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine; deterministic ties via id. Output
    (rank, vec_id, cos) with cos rounded to 6dp for cross-engine parity."""
    scored = cosine_to_query(df, query_vec, vec_col)
    top = (
        scored.select(id_col, F.round("cos", 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")) \
              .select("rank", id_col, "cos")


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane: component d is a
    signed value from md5(plane:d) — no RNG, reproducible everywhere."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        v = int(h[:8], 16) / float(1 << 32) * 2.0 - 1.0
        out.append(v)
    return out


def lsh_bucket(df: DataFrame, dim: int, n_planes: int = 8,
               vec_col: str = "embedding") -> DataFrame:
    """Adds ``bucket`` — n_planes sign bits of hyperplane projections."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(p, dim)])
        bit = F.when(_dot(v, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return df.withColumn("bucket", bucket.cast("long"))


def lsh_bucket_tables(df: DataFrame, dim: int, n_planes: int = 8,
                      n_tables: int = 4, vec_col: str = "embedding") -> DataFrame:
    """Explode each row into ``n_tables`` (table, bucket) entries — table t
    uses planes [t*n_planes, (t+1)*n_planes).  Multiple independent tables
    are the standard recall lever for LSH *joins* (one table ANDs all
    plane bits; extra tables OR whole bucketings)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    entries = []
    for t in range(n_tables):
        bucket = F.lit(0)
        for p in range(n_planes):
            plane = F.array(*[F.lit(c) for c in _hyperplane(t * n_planes + p, dim)])
            bucket = bucket + F.when(_dot(v, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        entries.append(F.struct(F.lit(t).alias("tbl"),
                                bucket.cast("long").alias("bucket")))
    return (
        df.select("*", F.explode(F.array(*entries)).alias("_tb"))
        .withColumn("tbl", F.col("_tb.tbl"))
        .withColumn("bucket", F.col("_tb.bucket"))
        .drop("_tb")
    )


def ann_cosine_pairs(df: DataFrame, dim: int, threshold: float,
                     n_planes: int = 8, n_tables: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     max_bucket: int | None = None) -> DataFrame:
    """Approximate all-pairs similarity join (embedding dedup at pipeline
    scale): candidates = pairs sharing an LSH bucket in ANY of n_tables
    bucketings (self-equi-join on (tbl, bucket) — the minhash_bands shape,
    O(colliding pairs), never all-pairs), refined by EXACT cosine >=
    threshold.  All joins against the corpus-sized bucket/vector tables
    are shuffle joins on unique-ish keys — no broadcast.  Output
    (id_a, id_b, cos); recall vs brute force is tested in pytest."""
    ids_vec = df.select(id_col, vec_col)
    # localCheckpoint the bucket table: the (tbl, bucket) SELF-join — and
    # the hot-bucket cap's count+semi pair — evaluate their input subtree
    # once per occurrence, and the 32 hyperplane projections are
    # interpreted higher-order folds (the r5 plan re-ran them ~4x).  One
    # eager materialization of (id, tbl, bucket) replaces all of them
    # (minhash_dup_pairs rationale; blocks freed by the ContextCleaner).
    bucketed = lsh_bucket_tables(ids_vec, dim, n_planes, n_tables, vec_col) \
        .select(id_col, "tbl", "bucket").localCheckpoint()
    if max_bucket is not None:
        from vt_grid_spark.operators.dedup import cap_hot_buckets
        bucketed = cap_hot_buckets(bucketed, ["tbl", "bucket"], max_bucket)
    a = bucketed.select(F.col(id_col).alias("id_a"), "tbl", "bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"), "tbl", "bucket")
    # cand feeds the id-union semi-join AND the refine join — checkpoint
    # the post-distinct pair list so the bucket self-join runs once
    cand = (
        a.join(b.hint("shuffle_hash"), ["tbl", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint()
    )
    # refine vectors: semi-join to candidate ids, carry the norm ONCE per
    # vector (sqrt(dot(v, v)) exactly as before — computing it per vector
    # instead of per pair changes no float operation, only how often it
    # runs), checkpoint so each pair side reads the same materialization
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ids = cand.select(F.col("id_a").alias(id_col)).unionByName(
        cand.select(F.col("id_b").alias(id_col))).distinct()
    vt = (ids_vec.join(ids, id_col, "left_semi")
          .select(F.col(id_col), v.alias("_v"))
          .withColumn("_n", _norm(F.col("_v")))
          .localCheckpoint())
    va = vt.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"),
                   F.col("_n").alias("_na"))
    vb = vt.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"),
                   F.col("_n").alias("_nb"))
    cos = F.round(
        _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6)
    return (
        cand.join(va.hint("shuffle_hash"), "id_a")
        .join(vb.hint("shuffle_hash"), "id_b")
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def ivf_pivots(n_cells: int, dim: int) -> list[list[float]]:
    """Deterministic IVF coarse centroids: the same md5-derived
    pseudo-random unit-ish vectors as the LSH hyperplanes, offset into
    their own plane-id space so the two structures never share vectors.
    Deterministic pivots keep the whole index DuckDB-oracle-checkable
    (a trained k-means would add recall per probe but lose cross-engine
    reproducibility; the seam is this function)."""
    return [_hyperplane(10_000 + c, dim) for c in range(n_cells)]


def ivf_assign(df: DataFrame, dim: int, n_cells: int = 16,
               vec_col: str = "embedding") -> DataFrame:
    """Adds ``ivf_cell`` — argmax over pivot cosines (ties to the lower
    pivot id).  One codegen projection of n_cells fused dot products; at
    10^12 rows this is the scan-side partitioner that turns ANN into a
    probe of n_probe/n_cells of the corpus."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vn = _norm(v)
    entries = []
    for c, piv in enumerate(ivf_pivots(n_cells, dim)):
        pn = math.sqrt(sum(x * x for x in piv))
        # 9dp rounding before the argmax so a 1-ulp cross-engine summation
        # difference can never flip a near-tie (ties break on pivot id).
        # argmax as array_min over (-cos, c) structs: each pivot's dot
        # product appears ONCE in the expression tree — a chained
        # when/otherwise would double the tree per pivot (2^n blowup).
        cos = F.round(
            _dot(v, F.array(*[F.lit(x) for x in piv])) / (vn * F.lit(pn)), 9)
        entries.append(F.struct((-cos).alias("negcos"),
                                F.lit(c).alias("c")))
    best = F.array_min(F.array(*entries))
    return df.withColumn("ivf_cell", best["c"].cast("int"))


def ivf_topk(df: DataFrame, query_vec: list[float], k: int, dim: int,
             n_cells: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-flat top-k: score only rows whose ``ivf_cell`` is among the
    ``n_probe`` pivot cells nearest the query (exact cosine within the
    probed cells).  The probe set is a pure function of (query, pivots),
    so the operator is deterministic end-to-end; recall vs brute force is
    tested in pytest and the whole thing is oracle-checked."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    scored = []
    for c, piv in enumerate(ivf_pivots(n_cells, dim)):
        pn = math.sqrt(sum(x * x for x in piv))
        dot = sum(a * float(b) for a, b in zip(piv, query_vec))
        scored.append((round(dot / (pn * qn), 9), c))
    # ties to the lower pivot id, mirroring both ivf_assign and the oracle
    probes = [c for _, c in sorted(scored, key=lambda t: (-t[0], t[1]))[:n_probe]]
    cand = ivf_assign(df, dim, n_cells, vec_col) \
        .where(F.col("ivf_cell").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ann_cosine_topk(df: DataFrame, query_vec: list[float], k: int, dim: int,
                    n_planes: int = 8, probe_hamming: int = 1,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: only rows whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket are scored.  Falls back
    to exact scoring *within* the probed buckets; recall measured in tests."""
    bucketed = lsh_bucket(df, dim, n_planes, vec_col)

    qbucket = 0
    for p in range(n_planes):
        plane = _hyperplane(p, dim)
        dot = sum(a * float(b) for a, b in zip(plane, query_vec))
        if dot > 0:
            qbucket |= 1 << p
    probes = {qbucket}
    if probe_hamming >= 1:
        for i in range(n_planes):
            probes.add(qbucket ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbucket ^ (1 << i) ^ (1 << j))

    cand = bucketed.where(F.col("bucket").isin([int(b) for b in probes]))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
