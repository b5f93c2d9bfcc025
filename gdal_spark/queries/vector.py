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


_CELL = 24.0  # bbox-prefilter cell size (≈ octagon diameter)

_CELLS_EXPR = """
flatten(transform(
  sequence(cast(floor(_x0 / {c}) as int), cast(floor(_x1 / {c}) as int)),
  cx -> transform(
    sequence(cast(floor(_y0 / {c}) as int), cast(floor(_y1 / {c}) as int)),
    cy -> struct(cx, cy))))
""".format(c=_CELL)


def _with_cells(df, geom: str):
    """Explode the bbox cell cover (UDF bbox → plain columns first; HOF
    lambdas can't call Python UDFs)."""
    e = df.select(
        "*",
        F.expr(f"st_xmin({geom})").alias("_x0"),
        F.expr(f"st_xmax({geom})").alias("_x1"),
        F.expr(f"st_ymin({geom})").alias("_y0"),
        F.expr(f"st_ymax({geom})").alias("_y1"),
    )
    return e.select(
        df.columns + [F.explode(F.expr(_CELLS_EXPR)).alias("cell")]
    )


def _predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full intersects matrix WITHOUT a cross/nested-loop join: both
    layers explode their bbox cell cover, candidates come from the cell
    equi-join (the engine's 3-stage contract, operators/spatial_join.py),
    the exact predicate runs only on candidates, and non-candidates are
    restored as false via a left join from the id matrix (ids are dims,
    so that join broadcasts)."""
    register_st_functions(spark)
    a = tables.polygons_a_df(spark, sf_dir)
    b = tables.polygons_b_df(spark, sf_dir)
    ac = _with_cells(a.select("polygon_id", "geometry"), "geometry")
    bc = _with_cells(
        b.withColumnRenamed("geometry", "geometry_b").select(
            "b_id", "geometry_b"
        ),
        "geometry_b",
    )
    cand = (
        ac.join(bc, "cell")
        .groupBy("polygon_id", "b_id")
        .agg(
            F.first("geometry").alias("geometry"),
            F.first("geometry_b").alias("geometry_b"),
        )
        .select(
            "polygon_id",
            "b_id",
            F.expr("st_intersects(geometry, geometry_b)").alias("hit"),
        )
    )
    ids = a.select("polygon_id").crossJoin(b.select("b_id"))
    return ids.join(cand, ["polygon_id", "b_id"], "left").select(
        "polygon_id",
        "b_id",
        F.coalesce("hit", F.lit(False)).alias("intersects"),
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


# --- full predicate surface (hole-aware; ogr/ogrgeometry.cpp:569-599) -------
# Fixture: per nation n, a DONUT (20×20 outer, 8×8 hole) plus 9 probe
# squares in analytically-known relationships. The oracle is the analytic
# truth table — independent of the engine's ray-cast/edge kernels, so the
# hash gate pins Intersects/Touches/Contains/Within/Overlaps/Equals
# including the point-in-hole semantics the exterior-ring-only round-1
# kernels got wrong.

_PRED_TRUTH = {
    # type: (intersects, touches, contains, within, overlaps, equals)
    0: (False, False, False, False, False, False),  # strictly inside hole
    1: (True, False, True, False, False, False),    # in ring zone
    2: (True, True, False, False, False, False),    # shares outer edge
    3: (True, False, False, False, True, False),    # overlaps outer corner
    4: (True, False, False, True, False, False),    # equals the outer shell
    5: (False, False, False, False, False, False),  # disjoint
    6: (True, False, False, False, True, False),    # straddles hole edge
    7: (True, False, False, True, False, False),    # covers whole donut
    8: (True, False, True, True, False, True),      # exact copy of donut
}


def _pred_full_rows():
    import numpy as np

    from gdal_spark.geometry import wkb as W

    def sq(x0, y0, s):
        return np.array(
            [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]],
            dtype=np.float64,
        )

    rows = []
    for n in range(25):
        ox, oy = float((n % 5) * 30), float((n // 5) * 30)
        donut = W.polygon_to_wkb([sq(ox, oy, 20), sq(ox + 6, oy + 6, 8)])
        probes = {
            0: W.polygon_to_wkb([sq(ox + 8, oy + 8, 4)]),
            1: W.polygon_to_wkb([sq(ox + 1, oy + 1, 3)]),
            2: W.polygon_to_wkb([sq(ox + 20, oy + 4, 5)]),
            3: W.polygon_to_wkb([sq(ox + 18, oy + 18, 6)]),
            4: W.polygon_to_wkb([sq(ox, oy, 20)]),
            5: W.polygon_to_wkb([sq(ox + 24, oy + 24, 3)]),
            6: W.polygon_to_wkb([sq(ox + 4, oy + 4, 4)]),
            7: W.polygon_to_wkb([sq(ox - 2, oy - 2, 24)]),
            8: W.polygon_to_wkb([sq(ox, oy, 20), sq(ox + 6, oy + 6, 8)]),
        }
        for t, probe in probes.items():
            rows.append((n, t, donut, probe))
    return rows


def _predicates_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_st_functions(spark)
    df = spark.createDataFrame(
        _pred_full_rows(),
        "polygon_id long, probe_type int, geom_a binary, geom_b binary",
    )
    df.createOrReplaceTempView("pred_pairs")
    return spark.sql(
        """
        select polygon_id, probe_type,
               st_intersects(geom_a, geom_b) as p_intersects,
               st_touches(geom_a, geom_b) as p_touches,
               st_contains(geom_a, geom_b) as p_contains,
               st_within(geom_a, geom_b) as p_within,
               st_overlaps(geom_a, geom_b) as p_overlaps,
               st_equals(geom_a, geom_b) as p_equals
        from pred_pairs
        """
    )


def _predicates_full_oracle() -> str:
    vals = ",\n        ".join(
        f"({t}, {i}, {to}, {c}, {w}, {o}, {e})".lower()
        for t, (i, to, c, w, o, e) in sorted(_PRED_TRUTH.items())
    )
    return f"""
    with truth(probe_type, p_intersects, p_touches, p_contains, p_within,
               p_overlaps, p_equals) as (
      values
        {vals}
    ),
    n as (select cast(n_nationkey as bigint) as polygon_id from nation)
    select n.polygon_id, t.probe_type, t.p_intersects, t.p_touches,
           t.p_contains, t.p_within, t.p_overlaps, t.p_equals
    from n cross join truth t
    """


QUERIES["st_predicates_full"] = _predicates_full
ORACLES["st_predicates_full"] = _predicates_full_oracle()


# --- geodesic measures (ogrsqlitesqlfunctions.cpp:956-1148) ------------------
# Spherical great-circle length + longitude-strip spherical area over the
# octagon layer; the oracle states the SAME published spherical formulas
# directly in SQL over the vertex CTE (radians/sin are exact mirrors).


def _geodesic(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_st_functions(spark)
    a = tables.polygons_a_df(spark, sf_dir)
    a.createOrReplaceTempView("layer_a_geo")
    return spark.sql(
        """
        select polygon_id,
               round(st_geodesiclength(geometry), 4) as geo_len_m,
               round(st_geodesicarea(geometry) / 1000000.0, 4) as geo_area_km2
        from layer_a_geo
        """
    )


def _geodesic_oracle() -> str:
    from gdal_spark.geometry.kernels import EARTH_RADIUS_M

    verts = portable.poly_verts_cte("duckdb")
    R = EARTH_RADIUS_M
    return f"""
    with v as ({verts}),
    e as (
      select a.polygon_id,
             radians(a.vx) as lon1, radians(a.vy) as lat1,
             radians(b.vx) as lon2, radians(b.vy) as lat2
      from v a join v b on a.polygon_id = b.polygon_id and b.j = (a.j + 1) % 8
    ),
    m as (
      select polygon_id,
             sum(2.0 * {R!r} * asin(sqrt(
                 sin((lat2 - lat1) / 2.0) * sin((lat2 - lat1) / 2.0)
                 + cos(lat1) * cos(lat2)
                   * sin((lon2 - lon1) / 2.0) * sin((lon2 - lon1) / 2.0)
             ))) as len_m,
             sum((lon2 - lon1) * (2.0 + sin(lat1) + sin(lat2))) as strip
      from e group by polygon_id
    )
    select polygon_id,
           round(len_m, 4) as geo_len_m,
           round(abs(strip) * {R!r} * {R!r} / 2.0 / 1000000.0, 4)
             as geo_area_km2
    from m
    """


QUERIES["st_geodesic"] = _geodesic
ORACLES["st_geodesic"] = _geodesic_oracle()


# --- buffer styles (apps/gdalalg_vector_buffer.cpp:32-56) --------------------
# Segment/polyline fixtures from the octagon vertex CTE; the oracle is the
# CLOSED-FORM area of each styled buffer (flat = 2dL, square = 2dL + 4d²,
# single-sided = dL, bevel = 2d(L1+L2) − d²tan(α/2) + d²sinα/2,
# mitre = 2d(L1+L2) exactly — outer mitre kite equals the inner overlap
# kite), so agreement proves cap/join/side geometry, not just plumbing.

_BUF_D = 0.125  # binary-exact distance


def _buffer_styles(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_st_functions(spark)
    tables.register_views(spark, sf_dir)
    verts = portable.poly_verts_cte("spark")
    d = _BUF_D
    return spark.sql(f"""
    with v as ({verts}),
    pts as (
        select polygon_id,
               max(case when j = 0 then vx end) as x0,
               max(case when j = 0 then vy end) as y0,
               max(case when j = 2 then vx end) as x2,
               max(case when j = 2 then vy end) as y2,
               max(case when j = 4 then vx end) as x4,
               max(case when j = 4 then vy end) as y4
        from v group by polygon_id
    ),
    g as (
        select polygon_id,
               st_geomfromtext(concat('LINESTRING (', x0, ' ', y0, ', ',
                                      x4, ' ', y4, ')')) as seg,
               st_geomfromtext(concat('LINESTRING (', x0, ' ', y0, ', ',
                                      x2, ' ', y2, ', ',
                                      x4, ' ', y4, ')')) as path
        from pts
    )
    select polygon_id,
           round(st_area(st_buffer_style(seg, {d!r}, 'endcap=flat')), 6)
             as flat_area,
           round(st_area(st_buffer_style(seg, {d!r}, 'endcap=square')), 6)
             as square_area,
           round(st_area(st_buffer_style(seg, {d!r}, 'side=left')), 6)
             as left_area,
           round(st_area(st_buffer_style(path, {d!r},
                 'endcap=flat join=bevel')), 6) as bevel_area,
           round(st_area(st_buffer_style(path, {d!r},
                 'endcap=flat join=mitre')), 6) as mitre_area
    from g order by polygon_id
    """)


def _buffer_styles_oracle() -> str:
    verts = portable.poly_verts_cte("duckdb")
    d = _BUF_D
    return f"""
    with v as ({verts}),
    pts as (
        select polygon_id,
               max(case when j = 0 then vx end) as x0,
               max(case when j = 0 then vy end) as y0,
               max(case when j = 2 then vx end) as x2,
               max(case when j = 2 then vy end) as y2,
               max(case when j = 4 then vx end) as x4,
               max(case when j = 4 then vy end) as y4
        from v group by polygon_id
    ),
    m as (
        select polygon_id,
               sqrt((x4 - x0) * (x4 - x0) + (y4 - y0) * (y4 - y0)) as L,
               sqrt((x2 - x0) * (x2 - x0) + (y2 - y0) * (y2 - y0)) as L1,
               sqrt((x4 - x2) * (x4 - x2) + (y4 - y2) * (y4 - y2)) as L2,
               (x2 - x0) * (y4 - y2) - (y2 - y0) * (x4 - x2) as crs,
               (x2 - x0) * (x4 - x2) + (y2 - y0) * (y4 - y2) as dt
        from pts
    ),
    t as (
        select polygon_id, L, L1, L2,
               abs(crs) / (L1 * L2) as sina,
               dt / (L1 * L2) as cosa
        from m
    )
    select polygon_id,
           round(2 * {d!r} * L, 6) as flat_area,
           round(2 * {d!r} * L + 4 * {d!r} * {d!r}, 6) as square_area,
           round({d!r} * L, 6) as left_area,
           round(2 * {d!r} * (L1 + L2)
                 - {d!r} * {d!r} * sina / (1 + cosa)
                 + {d!r} * {d!r} * sina / 2, 6) as bevel_area,
           round(2 * {d!r} * (L1 + L2), 6) as mitre_area
    from t order by polygon_id
    """


QUERIES["st_buffer_styles"] = _buffer_styles
ORACLES["st_buffer_styles"] = _buffer_styles_oracle()


# --- layer-algebra suite: Identity / Clip / SymDifference / Update
# (ogrlayer.cpp:5361-7822 — §2.7 row 22, was pytest-invariants-only).
# One tagged union of the four remaining ops; golden rows built with the
# INDEPENDENT vertex-construction kernels (_vc_*), not the engine's
# Sutherland-Hodgman machinery.


def _layer_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = tables.polygons_a_df(spark, sf_dir)
    payload = tables.polygons_b_payload()
    out = None
    for op in ("identity", "clip", "sym_difference", "update"):
        r = layer_algebra(op, a, payload).select(
            F.lit(op).alias("op"),
            "input_id",
            "method_id",
            F.round("area", 6).alias("area"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def _layer_suite_rows() -> list[tuple]:
    from gdal_spark.geometry.clip import _ccw

    a_rings = [_ccw(tables.polygon_rings_local(i)[:-1]) for i in range(25)]
    b_rings = [_ccw(tables.polygon_b_ring_local(j)) for j in range(25)]
    rows: list[tuple] = []

    def pair_rows(op):
        for i, a in enumerate(a_rings):
            for j, b in enumerate(b_rings):
                ia = _vc_area(_vc_intersection(a, b))
                if ia > 1e-9:
                    rows.append((op, i, j, round(ia, 6)))

    def input_leftovers(op):
        for i, a in enumerate(a_rings):
            left = _excl_area(a, b_rings)
            if left > 1e-12:
                rows.append((op, i, None, round(left, 6)))

    def method_leftovers(op):
        for j, b in enumerate(b_rings):
            left = _excl_area(b, a_rings)
            if left > 1e-12:
                rows.append((op, None, j, round(left, 6)))

    # identity: per-pair intersections + input leftovers
    pair_rows("identity")
    input_leftovers("identity")
    # clip: disjointed per-pair pieces, first method wins shared cover
    for i, a in enumerate(a_rings):
        prev: list = []
        for j, b in enumerate(b_rings):
            ab = _vc_intersection(a, b)
            area = _vc_area(ab)
            if area <= 1e-9:
                continue
            dup = sum(_vc_area(_vc_intersection(ab, p)) for p in prev)
            if area - dup > 1e-9:
                rows.append(("clip", i, j, round(area - dup, 6)))
            prev.append(b)
    # sym_difference: both sides' leftovers, no pair rows
    input_leftovers("sym_difference")
    method_leftovers("sym_difference")
    # update: input leftovers + method layer as-is
    input_leftovers("update")
    for j, b in enumerate(b_rings):
        rows.append(("update", None, j, round(_vc_area(b), 6)))
    return rows


def _layer_suite_oracle() -> str:
    def lit(v):
        if v is None:
            return "cast(null as bigint)"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, str):
            return f"'{v}'"
        return str(v)

    rows = _layer_suite_rows()
    body = ", ".join(
        "(" + ", ".join(lit(v) for v in r) + ")" for r in rows
    )
    return (
        f"select * from (values {body}) "
        "as t(op, input_id, method_id, area)"
    )


QUERIES["layer_algebra_suite"] = _layer_suite
ORACLES["layer_algebra_suite"] = _layer_suite_oracle()


# --- st_polygonize / st_buildarea (ogr/ogr_geometry.h:588-589) --------------
# Per-region irregular grid linework built from the region's nation keys
# (vertical lines x = n_nationkey crossed with horizontals y ∈ {0,1,3});
# polygonize face count and total area have CLOSED FORMS the oracle
# states directly: faces = 2·(nx−1), area = (max−min)·3. BuildArea on a
# noded grid yields the same filled extent (no odd-depth faces), so its
# area equals the polygonize total — both constructors ride one query.


def _polygonize_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from gdal_spark.functions.st import register_extra_st
    from gdal_spark.geometry import wkb as W

    register_st_functions(spark)
    register_extra_st(spark)

    _YS = (0.0, 1.0, 3.0)

    def make_grid(xs_col):
        out = []
        for xs in xs_col:
            vals = sorted(float(v) for v in xs)
            lines = [
                np.array([[x, _YS[0]], [x, _YS[-1]]]) for x in vals
            ] + [
                np.array([[vals[0], y], [vals[-1], y]]) for y in _YS
            ]
            out.append(W.multilinestring_to_wkb(lines))
        return pd.Series(out)

    spark.udf.register(
        "grid_wkb", F.pandas_udf(make_grid, BinaryType())
    )
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "nation_pg"
    )
    return spark.sql(
        """
        with g as (
          select n_regionkey,
                 grid_wkb(collect_list(cast(n_nationkey as double))) as lw
          from nation_pg group by n_regionkey
        )
        select n_regionkey,
               st_numgeometries(st_polygonize(lw)) as n_faces,
               round(st_area(st_polygonize(lw)), 6) as total_area,
               round(st_area(st_buildarea(lw)), 6) as built_area
        from g
        order by n_regionkey
        """
    )


def _polygonize_grid_oracle() -> str:
    return """
    select n_regionkey,
           2 * (count(distinct n_nationkey) - 1) as n_faces,
           round(cast((max(n_nationkey) - min(n_nationkey)) * 3 as double), 6)
             as total_area,
           round(cast((max(n_nationkey) - min(n_nationkey)) * 3 as double), 6)
             as built_area
    from nation group by n_regionkey
    order by n_regionkey
    """


QUERIES["st_polygonize_grid"] = _polygonize_grid
ORACLES["st_polygonize_grid"] = _polygonize_grid_oracle()


def _curve_fixture_rows() -> list[tuple[int, str]]:
    """(id, wkb-hex) curve fixtures with analytic measures
    (deterministic serialization of literal control points)."""
    import numpy as np

    from gdal_spark.geometry import wkb as W

    def cs(pts):
        return (W.CIRCULARSTRING, False, False, np.array(pts, dtype=float))

    def ls(pts):
        return (W.LINESTRING, False, False, np.array(pts, dtype=float))

    full = cs([[3.0, 0.0], [-1.0, 0.0], [3.0, 0.0]])  # circle r=2 @ (1,0)
    s = float(np.sqrt(2) / 2)
    quarter = cs([[1.0, 0.0], [s, s], [0.0, 1.0]])  # quarter arc r=1
    halfdisc = (
        W.CURVEPOLYGON, False, False,
        [(W.COMPOUNDCURVE, False, False,
          [cs([[-1.0, 0.0], [0.0, 1.0], [1.0, 0.0]]),
           ls([[1.0, 0.0], [-1.0, 0.0]])])],
    )  # clockwise: exact convex path
    stadium = (
        W.CURVEPOLYGON, False, False,
        [(W.COMPOUNDCURVE, False, False,
          [ls([[-2.0, 1.0], [2.0, 1.0]]),
           cs([[2.0, 1.0], [3.0, 0.0], [2.0, -1.0]]),
           ls([[2.0, -1.0], [-2.0, -1.0]]),
           cs([[-2.0, -1.0], [-3.0, 0.0], [-2.0, 1.0]])])],
    )  # 4x2 rect + two r=1 caps
    annulus = (
        W.CURVEPOLYGON, False, False,
        [full, cs([[1.5, 0.0], [0.5, 0.0], [1.5, 0.0]])],
    )  # r=2 disc minus r=0.5 hole
    nodes = [full, quarter, halfdisc, stadium, annulus]
    return [(i, W.structured_to_wkb(n).hex()) for i, n in enumerate(nodes)]


def _curve_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form curve measures (VERDICT r4 next #3): st_length /
    st_area dispatch to geometry/curve.py on curve-typed WKB
    (ogrcircularstring.cpp:195 get_Length, :865 get_Area) — the oracle
    states the ANALYTIC values (pi()-expressions in SQL), so any
    stroking approximation would fail the 6-dp hash."""
    register_st_functions(spark)
    rows = _curve_fixture_rows()
    vals = ", ".join(f"({i}, '{h}')" for i, h in rows)
    return spark.sql(f"""
    select id,
           round(st_length(unhex(wkb_hex)), 6) as len,
           round(st_area(unhex(wkb_hex)), 6) as area
    from (select * from values {vals} as t(id, wkb_hex))
    order by id
    """)


def _curve_measures_oracle() -> str:
    return """
    select * from (values
      (0, round(4*pi(), 6), round(4*pi(), 6)),
      (1, round(pi()/2, 6), cast(0.0 as double)),
      (2, round(pi()+2, 6), round(pi()/2, 6)),
      (3, round(8+2*pi(), 6), round(8+pi(), 6)),
      (4, round(5*pi(), 6), round(3.75*pi(), 6))
    ) as t(id, len, area)
    order by id
    """


QUERIES["st_curve_measures"] = _curve_measures
ORACLES["st_curve_measures"] = _curve_measures_oracle()


# --- vector index (ogrtindex; apps/gdalalg_vector_index.h:29) ---------------
# One row per layer: location, feature count, extent envelope. Both
# octagon layers derive bit-exactly in numpy and SQL, so the envelope
# bounds are oracle-checkable to 6 dp.


def _vector_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.layer_algebra import vector_tile_index

    register_st_functions(spark)
    a = tables.polygons_a_df(spark, sf_dir)
    b = tables.polygons_b_df(spark, sf_dir)
    out = vector_tile_index([("layer_a", a), ("layer_b", b)])
    return out.orderBy("location")


def _vector_index_oracle() -> str:
    av = portable.poly_verts_cte("duckdb")
    bv = portable.poly_b_verts_cte("duckdb")
    return f"""
    with av as ({av}), bv as ({bv})
    select 'layer_a' as location,
           count(distinct polygon_id) as n_features,
           round(min(vx), 6) as minx, round(min(vy), 6) as miny,
           round(max(vx), 6) as maxx, round(max(vy), 6) as maxy
    from av
    union all
    select 'layer_b' as location,
           count(distinct b_id) as n_features,
           round(min(vx), 6) as minx, round(min(vy), 6) as miny,
           round(max(vx), 6) as maxx, round(max(vy), 6) as maxy
    from bv
    order by location
    """


QUERIES["vector_index"] = _vector_index
ORACLES["vector_index"] = _vector_index_oracle()


# --- vector reproject (apps/gdalalg_vector_reproject.cpp) -------------------
# Layer A octagons → EPSG:3857; the engine's numpy LatLonToMeters uses
# the exact float-op order of portable.mercator_xy's SQL, so per-polygon
# envelope bounds in meters agree to well below the 4-dp round.


def _vector_reproject_merc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.reproject import vector_reproject

    register_st_functions(spark)
    a = tables.polygons_a_df(spark, sf_dir)
    m = vector_reproject(a, "EPSG:3857")
    return m.select(
        "polygon_id",
        F.round(F.expr("st_xmin(geometry)"), 4).alias("minx_m"),
        F.round(F.expr("st_ymin(geometry)"), 4).alias("miny_m"),
        F.round(F.expr("st_xmax(geometry)"), 4).alias("maxx_m"),
        F.round(F.expr("st_ymax(geometry)"), 4).alias("maxy_m"),
    ).orderBy("polygon_id")


def _vector_reproject_merc_oracle() -> str:
    av = portable.poly_verts_cte("duckdb")
    mx, my = portable.mercator_xy("vy", "vx")
    return f"""
    with av as ({av}),
    m as (
      select polygon_id, {mx} as mx, {my} as my from av
    )
    select polygon_id,
           round(min(mx), 4) as minx_m, round(min(my), 4) as miny_m,
           round(max(mx), 4) as maxx_m, round(max(my), 4) as maxy_m
    from m group by polygon_id order by polygon_id
    """


QUERIES["vector_reproject_merc"] = _vector_reproject_merc
ORACLES["vector_reproject_merc"] = _vector_reproject_merc_oracle()


# --- gdal pipeline runner (apps/gdalalg_pipeline.cpp) ------------------------
# A '!'-separated step chain through gdal_spark.pipeline: geocoded pages
# get a point geometry (make-point), a spatial bbox filter (the
# SetSpatialFilterRect envelope rule), projection, sort, and a binding
# limit.  The oracle rewrites the same chain as one SQL statement —
# point envelope == the point, so the bbox filter is exactly the
# lon/lat range test.


def _pipeline_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.pipeline import run_vector_pipeline

    return run_vector_pipeline(
        spark,
        "read geo_pages ! make-point --x lon --y lat "
        "! filter --bbox -10.03,35.02,20.01,55.04 "
        "! select --fields url,lang,city_id "
        "! sort --by city_id,url ! limit 40",
        sf_dir=sf_dir,
    )


def _pipeline_chain_oracle() -> str:
    return f"""
    with g as ({portable.geo_pages_cte('duckdb')})
    select url, lang, city_id from g
    where lon >= -10.03 and lon <= 20.01
      and lat >= 35.02 and lat <= 55.04
    order by city_id, url limit 40
    """


QUERIES["pipeline_chain"] = _pipeline_chain
ORACLES["pipeline_chain"] = _pipeline_chain_oracle()


# --- GeoJSON codec (RFC 7946; the reference's geojson writer analog) ---

def _geojson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per page: the GeoJSON Point of the 3-dp-rounded coordinates
    (string-exact vs a pure-SQL JSON construction — the same
    shortest-repr trick as st_point_roundtrip) plus a WKT-identity
    round-trip bit through st_geomfromgeojson on the page's envelope
    polygon (geometry→json→geometry must preserve st_astext exactly)."""
    register_st_functions(spark)
    gp = tables.geo_pages(spark, sf_dir)
    gp.createOrReplaceTempView("gp")
    return spark.sql(
        """
        select url,
               st_asgeojson(st_makepoint(cast(round(lon, 3) as double),
                                         cast(round(lat, 3) as double)))
                 as gj_point,
               st_astext(st_geomfromgeojson(st_asgeojson(
                   st_envelope(st_makepoint(lon, lat)))))
                 = st_astext(st_envelope(st_makepoint(lon, lat)))
                 as roundtrip_ok
        from gp
        """
    )


def _geojson_roundtrip_oracle() -> str:
    g = portable.geo_pages_cte("duckdb")
    num = (
        lambda c: f"regexp_replace(cast(round({c}, 3) as varchar), '\\.0$', '')"
    )
    return f"""
    with g as ({g})
    select url,
           concat('{{"type":"Point","coordinates":[', {num('lon')}, ',',
                  {num('lat')}, ']}}') as gj_point,
           true as roundtrip_ok
    from g
    """


QUERIES["st_geojson_roundtrip"] = _geojson_roundtrip
ORACLES["st_geojson_roundtrip"] = _geojson_roundtrip_oracle()
