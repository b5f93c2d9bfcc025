"""Distributed DBSCAN (Ester et al., KDD 1996) over point columns.

The density-clustering companion to the engine's spatial-join family,
built from its two existing machines: ε-neighbor candidate generation is
the cell-key equi-join (grid cell = ⌊coord/ε⌋, a pair within ε always
shares a 3×3 cell neighborhood — the same pigeonhole discipline as
operators/spatial_join.cell_pip_join), and cluster formation is the
pointer-jumping connected-components loop
(raster/polygonize.connected_components — O(log n) rounds of linear
shuffles, state bounded by CORE points only, never a driver union-find).

Determinism (the published algorithm leaves border assignment
order-dependent): cluster_id = MIN core id of the component, and a
border point joins the MINIMUM cluster id among its core neighbors —
both well-defined regardless of partitioning, so the result is
reproducible across runs/engines and the DuckDB oracle can mirror it
exactly (O(n²) neighbor join + recursive-CTE components at fixture
scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eps_neighbors(
    points: DataFrame,
    eps: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(id_a, id_b) DIRECTED pairs with 0 < dist ≤ eps (planar).

    One side explodes to its 3×3 cell neighborhood and equi-joins the
    other side's HOME cell, so every ordered pair is produced exactly
    once (no post-join dedup) and the shuffle is keyed by cell — the
    skew/locality profile of the spatial-join family.  Scale: candidate
    volume is Σ|cell|·|neighborhood|, bounded for any fixed density;
    a degenerate all-points-one-cell input degrades to the quadratic
    the ALGORITHM requires (every point really has n neighbors)."""
    e2 = eps * eps
    p = points.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
        F.floor(F.col(x_col) / eps).cast("long").alias("_cx"),
        F.floor(F.col(y_col) / eps).cast("long").alias("_cy"),
    )
    a = p.selectExpr(
        "_id as id_a", "_x as xa", "_y as ya",
        "explode(flatten(transform(sequence(-1, 1), dx -> "
        "transform(sequence(-1, 1), dy -> "
        "struct(_cx + dx as ncx, _cy + dy as ncy))))) as nc",
    ).selectExpr("id_a", "xa", "ya", "nc.ncx as _cx", "nc.ncy as _cy")
    b = p.selectExpr("_id as id_b", "_x as xb", "_y as yb", "_cx", "_cy")
    return (
        a.join(b, ["_cx", "_cy"])
        .where(
            (F.col("id_a") != F.col("id_b"))
            & (
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
                <= F.lit(e2)
            )
        )
        .select("id_a", "id_b")
    )


def dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int = 4,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(id, cluster_id, role) for every input point.

    role: 'core' (≥ min_pts points within ε, SELF included — the
    original paper's counting), 'border' (non-core with a core
    neighbor; joins the minimum cluster id among its core neighbors),
    'noise' (cluster_id = NULL).  cluster_id = MIN core id of the
    density-connected component.

    Plan: one cell-key neighbor join (eps_neighbors) → one
    map-side-combined count → core-core edge filter → pointer-jumping
    CC over CORE points only (the iterative state never includes
    border/noise mass) → two small joins to label borders and restore
    isolated cores."""
    from gdal_spark.raster.polygonize import connected_components

    # persisted: the neighbor set feeds the degree count, the core-core
    # edge filter AND the border labeling — without the cache the
    # cell-join pipeline re-executes three times. It stays cached for
    # the returned DataFrame's lifetime (its lineage includes it).
    nbr = eps_neighbors(points, eps, id_col, x_col, y_col).persist()
    deg = nbr.groupBy("id_a").agg((F.count("*") + 1).alias("_n"))
    core = deg.where(F.col("_n") >= min_pts).select(
        F.col("id_a").alias("_cid")
    ).persist()
    cc_edges = (
        nbr.join(core.withColumnRenamed("_cid", "id_a"), "id_a")
        .join(core.withColumnRenamed("_cid", "id_b"), "id_b")
        .where(F.col("id_a") < F.col("id_b"))
        .select(F.col("id_a").alias("la"), F.col("id_b").alias("lb"))
    )
    comp = connected_components(cc_edges)
    core_lab = core.join(
        comp, core["_cid"] == comp["label"], "left"
    ).select(
        F.col("_cid").alias("_core_id"),
        F.coalesce("root", F.col("_cid")).alias("_cluster"),
    )
    border_lab = (
        nbr.join(
            core_lab.withColumnRenamed("_core_id", "id_b"), "id_b"
        )
        .groupBy("id_a")
        .agg(F.min("_cluster").alias("_bcluster"))
    )
    return (
        points.select(F.col(id_col).alias("id"))
        .join(core_lab.withColumnRenamed("_core_id", "id"), "id", "left")
        .join(border_lab.withColumnRenamed("id_a", "id"), "id", "left")
        .select(
            "id",
            F.coalesce("_cluster", "_bcluster").alias("cluster_id"),
            F.when(F.col("_cluster").isNotNull(), F.lit("core"))
            .when(F.col("_bcluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
        )
    )
