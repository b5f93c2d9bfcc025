"""Vector geometry queries — ST_* registry + layer algebra (SURVEY §2.3,
§2.7, §2.8).

Layer A = nation octagons (portable.poly_verts_cte), layer B = shifted
octagons (portable.poly_b_verts_cte). Both layers derive bit-exactly in
numpy (tables.*_local) and SQL, so geometry results are oracle-checkable:

- st_polygon_metrics: area/perimeter/centroid/npoints via the ST_ UDF
  registry vs SQL shoelace over the vertex CTE.
- st_point_roundtrip: WKB point encode/decode round-trip vs direct SQL.
- st_predicates: pairwise convex-convex intersects matrix vs the SQL
  edge-crossing + vertex-containment construction.
- layer_intersection_area: OGRLayer::Intersection piece areas vs the
  convex-convex intersection-polygon construction in pure SQL
  (portable.convex_intersection_area_sql).
- layer algebra union/erase/identity/clip/... : rows-only here (pinned
  by area-invariant pytest goldens in tests/test_layer_algebra.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import portable, tables
from gdal_spark.functions import register_st_functions
from gdal_spark.operators.layer_algebra import layer_algebra


def _metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_st_functions(spark)
    a = tables.polygons_a_df(spark, sf_dir)
    a.createOrReplaceTempView("layer_a")
    return spark.sql(
        """
        select polygon_id,
               round(st_area(geometry), 6) as area,
               round(st_length(geometry), 6) as perimeter,
               round(st_x(st_centroid(geometry)), 6) as cx,
               round(st_y(st_centroid(geometry)), 6) as cy,
               st_numpoints(geometry) as npoints,
               st_isvalid(geometry) as valid
        from layer_a
        """
    )


def _metrics_oracle() -> str:
    verts = portable.poly_verts_cte("duckdb")
    return f"""
    with v as ({verts}),
    e as (
      select a.polygon_id, a.vx as x1, a.vy as y1, b.vx as x2, b.vy as y2
      from v a join v b on a.polygon_id = b.polygon_id and b.j = (a.j + 1) % 8
    ),
    m as (
      select polygon_id,
             sum(x1 * y2 - x2 * y1) / 2.0 as sa,
             sum(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))) as perim,
             sum((x1 + x2) * (x1 * y2 - x2 * y1)) as cx6,
             sum((y1 + y2) * (x1 * y2 - x2 * y1)) as cy6
      from e group by polygon_id
    )
    select polygon_id,
           round(abs(sa), 6) as area,
           round(perim, 6) as perimeter,
           round(cx6 / (6.0 * sa), 6) as cx,
           round(cy6 / (6.0 * sa), 6) as cy,
           9 as npoints,
           true as valid
    from m
    """


def _point_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_st_functions(spark)
    gp = tables.geo_pages(spark, sf_dir)
    gp.createOrReplaceTempView("gp")
    return spark.sql(
        """
        select url,
               st_x(st_makepoint(lon, lat)) as x,
               st_y(st_makepoint(lon, lat)) as y,
               st_astext(st_makepoint(cast(round(lon, 3) as double),
                                      cast(round(lat, 3) as double))) as wkt
        from gp
        """
    )


def _point_roundtrip_oracle() -> str:
    g = portable.geo_pages_cte("duckdb")
    # WKT number formatting: shortest-roundtrip repr of round(x,3) ==
    # DuckDB's varchar cast for 3-decimal doubles (both trim zeros).
    return f"""
    with g as ({g})
    select url, lon as x, lat as y,
           concat('POINT (',
                  regexp_replace(cast(round(lon, 3) as varchar), '\\.0$', ''),
                  ' ',
                  regexp_replace(cast(round(lat, 3) as varchar), '\\.0$', ''),
                  ')') as wkt
    from g
    """


def _predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_st_functions(spark)
    a = tables.polygons_a_df(spark, sf_dir)
    b = tables.polygons_b_df(spark, sf_dir)
    pairs = a.crossJoin(b.withColumnRenamed("geometry", "geometry_b"))
    return pairs.select(
        "polygon_id",
        "b_id",
        F.expr("st_intersects(geometry, geometry_b)").alias("intersects"),
    )


def _predicates_oracle() -> str:
    area_sql = portable.convex_intersection_area_sql("duckdb")
    # intersects(convex, convex) ⇔ positive-area intersection OR touch;
    # our layers never merely touch (generic offsets), so the area
    # construction is the exact predicate.
    return f"""
    with ia as ({area_sql}),
    a_ids as (select cast(n_nationkey as bigint) as polygon_id from nation),
    b_ids as (select cast(n_nationkey as bigint) as b_id from nation)
    select a.polygon_id, b.b_id,
           (ia.input_id is not null) as intersects
    from a_ids a cross join b_ids b
    left join ia on ia.input_id = a.polygon_id and ia.method_id = b.b_id
    """


def _layer_intersection_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = tables.polygons_a_df(spark, sf_dir)
    out = layer_algebra("intersection", a, tables.polygons_b_payload())
    return out.select(
        "input_id", "method_id", F.round("area", 6).alias("inter_area")
    )


def _layer_union_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = tables.polygons_a_df(spark, sf_dir)
    out = layer_algebra("union", a, tables.polygons_b_payload())
    return out.select("input_id", "method_id", F.round("area", 6).alias("area"))


def _layer_erase_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = tables.polygons_a_df(spark, sf_dir)
    out = layer_algebra("erase", a, tables.polygons_b_payload())
    return out.select("input_id", F.round("area", 6).alias("area"))


QUERIES = {
    "st_polygon_metrics": _metrics,
    "st_point_roundtrip": _point_roundtrip,
    "st_predicates": _predicates,
    "layer_intersection_area": _layer_intersection_area,
    "layer_union_rows": _layer_union_rows,
    "layer_erase_rows": _layer_erase_rows,
}

ORACLES = {
    "st_polygon_metrics": _metrics_oracle(),
    "st_point_roundtrip": _point_roundtrip_oracle(),
    "st_predicates": _predicates_oracle(),
    "layer_intersection_area": portable.convex_intersection_area_sql("duckdb"),
}


# --- OGR special fields (FID, OGR_GEOMETRY, OGR_GEOM_AREA — ogr/ogr_p.h:167) ---

def _special_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_st_functions(spark)
    a = tables.polygons_a_df(spark, sf_dir)
    a.createOrReplaceTempView("layer_a_sf")
    return spark.sql(
        """
        select polygon_id as fid,
               'POLYGON' as ogr_geometry,
               round(st_area(geometry), 6) as ogr_geom_area
        from layer_a_sf
        """
    )


def _special_fields_oracle() -> str:
    verts = portable.poly_verts_cte("duckdb")
    return f"""
    with v as ({verts}),
    e as (
      select a.polygon_id, a.vx as x1, a.vy as y1, b.vx as x2, b.vy as y2
      from v a join v b on a.polygon_id = b.polygon_id and b.j = (a.j + 1) % 8
    )
    select polygon_id as fid, 'POLYGON' as ogr_geometry,
           round(abs(sum(x1 * y2 - x2 * y1) / 2.0), 6) as ogr_geom_area
    from e group by polygon_id
"""


QUERIES["ogr_special_fields"] = _special_fields
ORACLES["ogr_special_fields"] = _special_fields_oracle()


# --- golden-literal oracles for union/erase leftovers ------------------------
# Independent area computation: convex-convex intersection by the
# VERTEX CONSTRUCTION (A-verts-in-B + B-verts-in-A + edge crossings,
# angular sort, shoelace — the same math as the SQL oracle, in numpy),
# NOT the engine's Sutherland-Hodgman clipper; |A − ∪B| via
# inclusion-exclusion over the (≤2) overlapping method polygons.

import numpy as np  # noqa: E402


def _vc_intersection(a: np.ndarray, b: np.ndarray) -> np.ndarray | None:
    """Convex∩convex by vertex construction → CCW ring or None."""
    from gdal_spark.geometry.kernels import points_in_rings

    pts = []
    pts += [p for p in a if points_in_rings([p[0]], [p[1]], [b])[0]]
    pts += [p for p in b if points_in_rings([p[0]], [p[1]], [a])[0]]
    na, nb = len(a), len(b)
    for i in range(na):
        p1, p2 = a[i], a[(i + 1) % na]
        for j in range(nb):
            q1, q2 = b[j], b[(j + 1) % nb]
            den = (p2[0] - p1[0]) * (q2[1] - q1[1]) - (p2[1] - p1[1]) * (
                q2[0] - q1[0]
            )
            if den == 0:
                continue
            t = (
                (q1[0] - p1[0]) * (q2[1] - q1[1])
                - (q1[1] - p1[1]) * (q2[0] - q1[0])
            ) / den
            u = (
                (q1[0] - p1[0]) * (p2[1] - p1[1])
                - (q1[1] - p1[1]) * (p2[0] - p1[0])
            ) / den
            if 0 <= t <= 1 and 0 <= u <= 1:
                pts.append(p1 + t * (p2 - p1))
    if len(pts) < 3:
        return None
    arr = np.unique(np.array(pts, dtype=np.float64), axis=0)
    if len(arr) < 3:
        return None
    c = arr.mean(axis=0)
    ang = np.arctan2(arr[:, 1] - c[1], arr[:, 0] - c[0])
    return arr[np.argsort(ang, kind="stable")]


def _vc_area(ring: np.ndarray | None) -> float:
    if ring is None or len(ring) < 3:
        return 0.0
    x, y = ring[:, 0], ring[:, 1]
    return abs(
        float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2.0
    )


def _excl_area(subject: np.ndarray, clips: list[np.ndarray]) -> float:
    """|subject − ∪clips| by inclusion-exclusion (≤2 overlapping clips
    in these layers; asserts that bound)."""
    overlapping = [c for c in clips if _vc_area(_vc_intersection(subject, c)) > 1e-12]
    assert len(overlapping) <= 2, "layers changed: extend inclusion-exclusion"
    s = _vc_area(
        np.asarray(subject)
    )
    inter = sum(_vc_area(_vc_intersection(subject, c)) for c in overlapping)
    if len(overlapping) == 2:
        ab = _vc_intersection(overlapping[0], overlapping[1])
        if ab is not None:
            inter -= _vc_area(_vc_intersection(subject, ab))
    return s - inter


def _values_sql(rows: list[tuple], cols: list[str]) -> str:
    def lit(v):
        if v is None:
            return "cast(null as bigint)"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"select * from (values {body}) as t({', '.join(cols)})"


def _layer_rows_golden(op: str) -> list[tuple]:
    from gdal_spark.geometry.clip import _ccw

    a_rings = [_ccw(tables.polygon_rings_local(i)[:-1]) for i in range(25)]
    b_rings = [_ccw(tables.polygon_b_ring_local(j)) for j in range(25)]
    rows: list[tuple] = []
    if op in ("union",):
        for i, a in enumerate(a_rings):
            for j, b in enumerate(b_rings):
                ia = _vc_area(_vc_intersection(a, b))
                if ia > 1e-9:
                    rows.append((i, j, round(ia, 6)))
    for i, a in enumerate(a_rings):
        left = _excl_area(a, b_rings)
        if left > 1e-12:
            rows.append((i, None, round(left, 6)))
    if op == "union":
        for j, b in enumerate(b_rings):
            left = _excl_area(b, a_rings)
            if left > 1e-12:
                rows.append((None, j, round(left, 6)))
    return rows


def _union_oracle() -> str:
    return _values_sql(
        _layer_rows_golden("union"), ["input_id", "method_id", "area"]
    )


def _erase_oracle() -> str:
    rows = [(i, a) for (i, _m, a) in _layer_rows_golden("erase")]
    return _values_sql(rows, ["input_id", "area"])


ORACLES["layer_union_rows"] = _union_oracle()
ORACLES["layer_erase_rows"] = _erase_oracle()
