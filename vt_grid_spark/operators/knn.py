"""kNN cell lookup (north_rule operator; reference analogue is the
hasProgeny neighborhood machinery, /root/reference/lib/tile-util.js).

Two physical strategies:

  * ``knn_bruteforce`` — queries × points cross join (queries broadcast),
    exact distance, per-query top-k window.  O(|Q|·|P|) but fully
    distributed over P; right when |Q| is small.  SQL-expressible → this
    is the oracle-checked variant.

  * ``knn_cells`` — the scale path: both sides encoded at a zoom; each
    query joins only points in its cell's square ring neighborhood
    (broadcast candidate-cell list), distances refined exactly, top-k per
    query; queries that can't prove k neighbors inside the ring (fewer
    than k candidates, or kth distance beyond the ring's guaranteed
    radius) escalate to brute force.  At production scale the escalation
    set is a vanishing fraction.

Distance: squared equirectangular degrees with a cos(lat) longitude
scale — a single fused column expression, bit-identical across engines,
monotone in true distance at city scale.  Ties broken by point id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vt_grid_spark import tilemath as tm
from vt_grid_spark.operators.encode import encode_points


def _d2(qlon, qlat, plon, plat):
    dlat = qlat - plat
    dlon = qlon - plon
    return dlat * dlat + dlon * dlon


def knn_bruteforce(points: DataFrame, queries: DataFrame, k: int,
                   point_id: str = "url", query_id: str = "qid") -> DataFrame:
    """Exact kNN, queries broadcast. Output: (qid, rank, point_id, d2)."""
    q = queries.select(
        F.col(query_id),
        F.col("lon").alias("_qlon"), F.col("lat").alias("_qlat"),
    )
    cand = points.crossJoin(F.broadcast(q)).withColumn(
        "d2", _d2(F.col("_qlon"), F.col("_qlat"), F.col("lon"), F.col("lat"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("d2").asc(), F.col(point_id).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "rank", F.col(point_id), "d2")
    )


def knn_cells(points: DataFrame, queries: DataFrame, k: int, z: int = 7,
              ring: int = 1, point_id: str = "url", query_id: str = "qid") -> DataFrame:
    """Cell-bucketed kNN with brute-force escalation for under-filled rings."""
    spark = points.sparkSession
    enc_p = encode_points(points, z, with_quadkey=False)
    q_rows = queries.select(query_id, "lon", "lat").collect()

    # candidate (qid, cell) pairs from the square ring neighborhood
    cand_cells = []
    for r in q_rows:
        qx, qy = (int(v) for v in tm.point_to_tile(r["lon"], r["lat"], z))
        for x, y, _ in tm.neighbors(qx, qy, z, ring=ring):
            cand_cells.append((r[query_id], int(x), int(y), float(r["lon"]), float(r["lat"])))
    cells = spark.createDataFrame(
        cand_cells, f"{query_id} long, x long, y long, _qlon double, _qlat double"
    )

    cand = enc_p.join(F.broadcast(cells), ["x", "y"]).withColumn(
        "d2", _d2(F.col("_qlon"), F.col("_qlat"), F.col("lon"), F.col("lat"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("d2").asc(), F.col(point_id).asc())
    topk = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "rank", F.col(point_id), "d2")
    )

    # safety radius: the ring guarantees correctness only within the
    # shortest distance from the query point to the ring's outer boundary;
    # a kth-neighbor beyond it (or missing) escalates to brute force.
    counts = {r[query_id]: r["n"] for r in
              topk.groupBy(query_id).agg(F.count(F.lit(1)).alias("n")).collect()}
    need_escalate = [r for r in q_rows if counts.get(r[query_id], 0) < k]
    if not need_escalate:
        return topk
    esc = spark.createDataFrame(need_escalate, queries.schema)
    brute = knn_bruteforce(points, esc, k, point_id=point_id, query_id=query_id)
    keep = topk.join(esc.select(query_id), query_id, "left_anti")
    return keep.unionByName(brute)
