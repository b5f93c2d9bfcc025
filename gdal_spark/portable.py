"""Portable SQL fragments — identical semantics in Spark SQL and DuckDB.

The driver's correctness gate runs each Spark query next to an ANSI-SQL
oracle in DuckDB and compares value hashes. Every derived quantity
(geocode, cell keys, tile ids, hashes) is therefore defined ONCE here as
a deterministic formula over integer/double arithmetic that both engines
evaluate bit-identically:

- 64-bit portable hash: first 15 hex chars of md5 (60 bits, never
  negative). Spark ``conv(substring(md5(x),1,15),16,10)``; DuckDB
  ``cast(concat('0x', substring(md5(x),1,15)) as bigint)``.
- geocoding: hash of the url → one of 20 city centers (deliberately
  skewed via floor(sqrt(u)) so hot cells exercise skew handling) plus a
  hash-derived jitter. Pure +,-,*,/ on doubles → bit-exact everywhere.
- polygon layer: per-nation convex octagons built from LITERAL unit
  vertices (no trig at query time) → bit-exact vertices in numpy, Spark
  and DuckDB.
- WebMercatorQuad tile math with GDAL's exact constants
  (reference: swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:315-505,
  apps/gdalalg_raster_tile.cpp:488 for the XYZ/TMS y flip).

Reference semantics mirrored here: deterministic geocode replaces the
network geocoder (ogr/ogr_geocoding.cpp) per SURVEY §2.1; ray-cast
point-in-polygon follows the even-odd rule of GDAL's scanline fill
(alg/llrasterize.cpp:31-58 GDALdllImageFilledPolygon).
"""

from __future__ import annotations

# --- exact tile-math constants (gdal2tiles.py GlobalMercator) ---
ORIGIN_SHIFT = 20037508.342789244  # 2*pi*6378137/2
INITIAL_RESOLUTION = 156543.03392804062  # 2*pi*6378137/256
TILE_SIZE = 256
MAX_LAT = 85.05112878

# 20 city centers (lat, lon) — deterministic synthetic geography.
CITIES: list[tuple[float, float]] = [
    (40.7128, -74.0060),   # new york
    (51.5074, -0.1278),    # london
    (35.6895, 139.6917),   # tokyo
    (48.8566, 2.3522),     # paris
    (52.5200, 13.4050),    # berlin
    (40.4168, -3.7038),    # madrid
    (41.9028, 12.4964),    # rome
    (39.9042, 116.4074),   # beijing
    (55.7558, 37.6173),    # moscow
    (-33.8688, 151.2093),  # sydney
    (37.7749, -122.4194),  # san francisco
    (-23.5505, -46.6333),  # sao paulo
    (19.0760, 72.8777),    # mumbai
    (30.0444, 31.2357),    # cairo
    (6.5244, 3.3792),      # lagos
    (19.4326, -99.1332),   # mexico city
    (43.6532, -79.3832),   # toronto
    (37.5665, 126.9780),   # seoul
    (1.3521, 103.8198),    # singapore
    (-6.2088, 106.8456),   # jakarta
]

# Unit octagon (counter-clockwise), literal doubles so no trig is needed
# at query time (java.lang.Math vs libm could differ by 1 ulp).
S = 0.7071067811865476  # sqrt(2)/2
OCTAGON: list[tuple[float, float]] = [
    (1.0, 0.0), (S, S), (0.0, 1.0), (-S, S),
    (-1.0, 0.0), (-S, -S), (0.0, -1.0), (S, -S),
]
POLY_XSCALE = 1.3  # octagons are stretched in x → still convex


def hash64(expr: str, dialect: str) -> str:
    """Portable non-negative 60-bit hash of a string expression."""
    if dialect == "spark":
        return f"cast(conv(substring(md5({expr}),1,15),16,10) as bigint)"
    return f"cast(concat('0x', substring(md5({expr}),1,15)) as bigint)"


def idiv(a: str, b: str, dialect: str) -> str:
    """Integer division that stays exact on 60-bit values."""
    return f"(({a}) div ({b}))" if dialect == "spark" else f"(({a}) // ({b}))"


def case_city(expr_city: str, idx: int) -> str:
    """CASE returning the lat (idx=0) / lon (idx=1) of a city id expr."""
    arms = "".join(
        f" when {i} then cast({CITIES[i][idx]!r} as double)" for i in range(len(CITIES))
    )
    return f"(case {expr_city}{arms} end)"


def pages_cte(dialect: str) -> str:
    """`pages` per BASELINE.json input_hint, derived deterministically from
    the driver's `documents` table. text is a byte-identical pass-through
    (the per-row invariant); html is its utf-8 encoding."""
    if dialect == "spark":
        ts = ("timestamp'2025-01-01 00:00:00' + "
              "make_interval(0,0,0,0,0,0,cast(doc_id as int))")
        html = "encode(text, 'utf-8')"
    else:
        ts = "TIMESTAMP '2025-01-01 00:00:00' + to_seconds(cast(doc_id as int))"
        html = "encode(text)"
    return f"""
  select concat('https://', source, '.example/', cast(doc_id as string)) as url,
         {ts} as warc_ts,
         {html} as html,
         text,
         lang
  from documents
"""


def geocode_cols_list(dialect: str, url: str = "url") -> list[str]:
    """The three geocode column exprs (city_id, lat, lon) separately —
    for DataFrame.selectExpr. Skewed on purpose: city = floor(sqrt(h mod
    400)) gives city c weight (2c+1)/400, so the hottest city holds ~10%
    of pages — exercises salting/AQE skew-join."""
    h = hash64(url, dialect)
    u = f"(({h}) % 400)"
    city = f"cast(floor(sqrt(cast({u} as double))) as int)"
    r1 = f"(cast({idiv(h, '400', dialect)} % 100000 as double) / 100000.0)"
    r2 = f"(cast({idiv(h, '40000000', dialect)} % 100000 as double) / 100000.0)"
    clat = case_city(city, 0)
    clon = case_city(city, 1)
    return [
        f"{city} as city_id",
        f"({clat} + ({r1} - 0.5) * 2.0) as lat",
        f"({clon} + ({r2} - 0.5) * 2.0) as lon",
    ]


def geocode_cols(dialect: str, url: str = "url") -> str:
    return ", ".join(geocode_cols_list(dialect, url))


def geo_pages_cte(dialect: str) -> str:
    """pages + deterministic geocode (url,lat,lon,city_id,text,lang)."""
    return (
        f"select url, warc_ts, text, lang, {geocode_cols(dialect)} "
        f"from ({pages_cte(dialect)})"
    )


def polygon_radius_sql(n: str) -> str:
    """Circumradius in degrees for nation id expr `n` (5 distinct sizes)."""
    return f"(0.35 + cast(({n}) % 5 as double) * 0.25)"


def poly_verts_cte(dialect: str) -> str:
    """One row per (polygon_id, j, vx, vy) octagon vertex, derived from the
    `nation` table: polygon_id = n_nationkey, center = city(n % 20).
    25 polygons over 20 cities → 5 cities carry two overlapping polygons
    (multi-match joins). Vertices are literal-unit-octagon affine images:
    bit-exact in SQL and numpy."""
    unit = " union all ".join(
        f"select {j} as j, cast({ux!r} as double) as ux, cast({uy!r} as double) as uy"
        for j, (ux, uy) in enumerate(OCTAGON)
    )
    n = "n_nationkey"
    city = f"cast(({n}) % 20 as int)"
    r = polygon_radius_sql(n)
    clat = case_city(city, 0)
    clon = case_city(city, 1)
    return f"""
  select cast({n} as bigint) as polygon_id, n_name as polygon_name, u.j as j,
         ({clon} + {r} * {POLY_XSCALE!r} * u.ux) as vx,
         ({clat} + {r} * u.uy) as vy
  from nation cross join ({unit}) u
"""


def pip_join_sql(dialect: str, limit_pages: str = "") -> str:
    """Full spatial-join oracle: pages × polygon edges, even-odd ray cast.
    Mirrors the 3-stage contract of OGRLayer::FilterGeometry
    (ogrlayer.cpp:3981-4048): bbox prefilter then exact refine."""
    return f"""
with pages as ({geo_pages_cte(dialect)}),
verts as ({poly_verts_cte(dialect)}),
nxt as (
  select a.polygon_id, a.polygon_name, a.vx as x1, a.vy as y1, b.vx as x2, b.vy as y2
  from verts a join verts b
    on a.polygon_id = b.polygon_id and b.j = (a.j + 1) % 8
),
boxes as (
  select polygon_id, min(x1) as minx, max(x1) as maxx, min(y1) as miny, max(y1) as maxy
  from nxt group by polygon_id
),
cand as (
  select p.url, p.lat, p.lon, b.polygon_id
  from pages p join boxes b
    on p.lon >= b.minx and p.lon <= b.maxx and p.lat >= b.miny and p.lat <= b.maxy
  {limit_pages}
),
hits as (
  select c.url, c.polygon_id,
         sum(case when ((e.y1 > c.lat) <> (e.y2 > c.lat))
                   and (c.lon < (e.x2 - e.x1) * (c.lat - e.y1) / (e.y2 - e.y1) + e.x1)
              then 1 else 0 end) as crossings
  from cand c join nxt e on c.polygon_id = e.polygon_id
  group by c.url, c.polygon_id
)
select url, polygon_id from hits where crossings % 2 = 1
"""


def mercator_xy(lat: str, lon: str) -> str:
    """EPSG:4326 → EPSG:3857 (mx, my) column fragments as a 2-tuple source.
    Formula: gdal2tiles.py:366-372 (LatLonToMeters)."""
    mx = f"(({lon}) * {ORIGIN_SHIFT!r} / 180.0)"
    my = (
        f"(ln(tan((90.0 + ({lat})) * pi() / 360.0)) / (pi() / 180.0)"
        f" * {ORIGIN_SHIFT!r} / 180.0)"
    )
    return mx, my


def tile_cols(lat: str, lon: str, z: int) -> str:
    """tile_x, tile_y (XYZ convention) at a fixed zoom, pure SQL.
    gdal2tiles.py:398-412 (MetersToTile: tx=ceil(px/256)-1) +
    apps/gdalalg_raster_tile.cpp:488 (y_xyz = 2^z-1-y_tms)."""
    mx, my = mercator_xy(lat, lon)
    res = INITIAL_RESOLUTION / (2 ** z)
    px = f"(({mx} + {ORIGIN_SHIFT!r}) / {res!r})"
    py = f"(({my} + {ORIGIN_SHIFT!r}) / {res!r})"
    tx = f"(cast(ceil({px} / 256.0) as bigint) - 1)"
    ty_tms = f"(cast(ceil({py} / 256.0) as bigint) - 1)"
    ty_xyz = f"({2 ** z} - 1 - {ty_tms})"
    return f"{tx} as tile_x, {ty_xyz} as tile_y"


def tile_cols_list(lat: str, lon: str, z: int) -> list[str]:
    """tile_cols split for DataFrame.selectExpr (one expr per element)."""
    txt = tile_cols(lat, lon, z)
    i = txt.index(" as tile_x, ")
    return [txt[: i + len(" as tile_x")], txt[i + len(" as tile_x, ") :]]


GEODETIC_RES_FACT = 180.0 / TILE_SIZE  # 0.703125, binary-exact


def tile_cols_geodetic(lat: str, lon: str, z: int) -> str:
    """WorldCRS84Quad tile_x, tile_y (XYZ convention) at a fixed zoom —
    the geodetic tiling scheme of `gdal raster tile --tiling-scheme
    WorldCRS84Quad` (gcore/tilematrixset.cpp:175-215;
    gdal2tiles.py:582-598 GlobalGeodetic LonLatToPixels/PixelsToTile
    with the tmscompatible resFact 180/256). Pure linear arithmetic on
    binary-exact constants (res = 0.703125/2^z) — Spark and DuckDB
    evaluate it bit-identically, and it is operation-for-operation the
    numpy in cellindex.tile.lonlat_to_tile_geodetic. Matrix is 2*2^z
    wide x 2^z tall; clip + XYZ flip per gdalalg_raster_tile.cpp:488."""
    res = GEODETIC_RES_FACT / (2 ** z)
    px = f"((180.0 + ({lon})) / {res!r})"
    py = f"((90.0 + ({lat})) / {res!r})"
    n = 2 ** z
    tx = (
        f"greatest(0, least({2 * n - 1}, "
        f"cast(ceil({px} / 256.0) as bigint) - 1))"
    )
    ty_tms = (
        f"greatest(0, least({n - 1}, "
        f"cast(ceil({py} / 256.0) as bigint) - 1))"
    )
    ty_xyz = f"({n} - 1 - {ty_tms})"
    return f"{tx} as tile_x, {ty_xyz} as tile_y"


def tile_cols_geodetic_list(lat: str, lon: str, z: int) -> list[str]:
    """tile_cols_geodetic split for DataFrame.selectExpr."""
    txt = tile_cols_geodetic(lat, lon, z)
    i = txt.index(" as tile_x, ")
    return [txt[: i + len(" as tile_x")], txt[i + len(" as tile_x, ") :]]


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle distance in meters (R=6371008.8)."""
    return (
        f"(2.0 * 6371008.8 * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2.0), 2.0)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians(({lon2}) - ({lon1})) / 2.0), 2.0))))"
    )


# --- second polygon layer (B) for two-layer ops: shifted/re-scaled octagons ---

POLY_B_SHIFT_LON = 0.4
POLY_B_SHIFT_LAT = 0.2
POLY_B_XSCALE = 1.1


def polygon_b_radius_sql(n: str) -> str:
    return f"(0.3 + cast(({n}) % 4 as double) * 0.2)"


def poly_b_verts_cte(dialect: str) -> str:
    """Layer B octagon vertices (b_id, j, vx, vy) from `nation`; centers
    shifted by (+0.4 lon, +0.2 lat) vs layer A so overlay results are
    generic (no shared-edge degeneracies)."""
    unit = " union all ".join(
        f"select {j} as j, cast({ux!r} as double) as ux, cast({uy!r} as double) as uy"
        for j, (ux, uy) in enumerate(OCTAGON)
    )
    n = "n_nationkey"
    city = f"cast(({n}) % 20 as int)"
    r = polygon_b_radius_sql(n)
    clat = case_city(city, 0)
    clon = case_city(city, 1)
    return f"""
  select cast({n} as bigint) as b_id, u.j as j,
         ({clon} + {POLY_B_SHIFT_LON!r} + {r} * {POLY_B_XSCALE!r} * u.ux) as vx,
         ({clat} + {POLY_B_SHIFT_LAT!r} + {r} * u.uy) as vy
  from nation cross join ({unit}) u
"""


def _edges_cte(verts: str, idc: str) -> str:
    """Directed edges with wraparound from a (id, j, vx, vy) vertex set."""
    return f"""
  select a.{idc}, a.vx as x1, a.vy as y1, b.vx as x2, b.vy as y2
  from ({verts}) a join ({verts}) b
    on a.{idc} = b.{idc} and b.j = (a.j + 1) % 8
"""


def convex_intersection_area_sql(dialect: str) -> str:
    """Oracle for layer-algebra Intersection: |A_i ∩ B_j| for every
    bbox-overlapping polygon pair, via the convex-convex construction —
    vertex set = {A verts in B} ∪ {B verts in A} ∪ {edge×edge crossing
    points}, angularly sorted, shoelace. Pure SQL in both engines.
    Emits (input_id, method_id, inter_area) rounded to 6."""
    av = poly_verts_cte(dialect).replace("polygon_id", "a_id")
    bv = poly_b_verts_cte(dialect)
    return f"""
with av0 as ({av}),
av as (select a_id, j, vx, vy from av0),
bv as ({bv}),
ae as ({_edges_cte('select a_id, j, vx, vy from av0', 'a_id')}),
be as ({_edges_cte(bv, 'b_id')}),
abox as (select a_id, min(vx) as minx, max(vx) as maxx,
                min(vy) as miny, max(vy) as maxy from av group by a_id),
bbox as (select b_id, min(vx) as minx, max(vx) as maxx,
                min(vy) as miny, max(vy) as maxy from bv group by b_id),
pairs as (
  select a.a_id, b.b_id from abox a join bbox b
    on a.minx <= b.maxx and b.minx <= a.maxx
   and a.miny <= b.maxy and b.miny <= a.maxy
),
a_in_b as (
  select p.a_id, p.b_id, v.vx as x, v.vy as y
  from pairs p
  join av v on v.a_id = p.a_id
  join be e on e.b_id = p.b_id
  group by p.a_id, p.b_id, v.vx, v.vy
  having sum(case when ((e.y1 > v.vy) <> (e.y2 > v.vy))
                   and (v.vx < (e.x2 - e.x1) * (v.vy - e.y1)
                                / (e.y2 - e.y1) + e.x1)
              then 1 else 0 end) % 2 = 1
),
b_in_a as (
  select p.a_id, p.b_id, v.vx as x, v.vy as y
  from pairs p
  join bv v on v.b_id = p.b_id
  join ae e on e.a_id = p.a_id
  group by p.a_id, p.b_id, v.vx, v.vy
  having sum(case when ((e.y1 > v.vy) <> (e.y2 > v.vy))
                   and (v.vx < (e.x2 - e.x1) * (v.vy - e.y1)
                                / (e.y2 - e.y1) + e.x1)
              then 1 else 0 end) % 2 = 1
),
xpts as (
  select p.a_id, p.b_id,
         ea.x1 + (((eb.x1 - ea.x1) * (eb.y2 - eb.y1)
                   - (eb.y1 - ea.y1) * (eb.x2 - eb.x1))
                  / ((ea.x2 - ea.x1) * (eb.y2 - eb.y1)
                     - (ea.y2 - ea.y1) * (eb.x2 - eb.x1)))
               * (ea.x2 - ea.x1) as x,
         ea.y1 + (((eb.x1 - ea.x1) * (eb.y2 - eb.y1)
                   - (eb.y1 - ea.y1) * (eb.x2 - eb.x1))
                  / ((ea.x2 - ea.x1) * (eb.y2 - eb.y1)
                     - (ea.y2 - ea.y1) * (eb.x2 - eb.x1)))
               * (ea.y2 - ea.y1) as y
  from pairs p
  join ae ea on ea.a_id = p.a_id
  join be eb on eb.b_id = p.b_id
  where ((ea.x2 - ea.x1) * (eb.y2 - eb.y1)
         - (ea.y2 - ea.y1) * (eb.x2 - eb.x1)) <> 0
    and (((eb.x1 - ea.x1) * (eb.y2 - eb.y1)
          - (eb.y1 - ea.y1) * (eb.x2 - eb.x1))
         / ((ea.x2 - ea.x1) * (eb.y2 - eb.y1)
            - (ea.y2 - ea.y1) * (eb.x2 - eb.x1))) between 0 and 1
    and (((eb.x1 - ea.x1) * (ea.y2 - ea.y1)
          - (eb.y1 - ea.y1) * (ea.x2 - ea.x1))
         / ((ea.x2 - ea.x1) * (eb.y2 - eb.y1)
            - (ea.y2 - ea.y1) * (eb.x2 - eb.x1))) between 0 and 1
),
pts as (
  select distinct a_id, b_id, x, y from (
    select * from a_in_b
    union all select * from b_in_a
    union all select * from xpts
  )
),
ctr as (
  select a_id, b_id, avg(x) as cx, avg(y) as cy, count(*) as n
  from pts group by a_id, b_id
),
ord as (
  select p.a_id, p.b_id, p.x, p.y, c.n,
         row_number() over (partition by p.a_id, p.b_id
                            order by atan2(p.y - c.cy, p.x - c.cx), p.x, p.y)
           as i
  from pts p join ctr c on p.a_id = c.a_id and p.b_id = c.b_id
),
area as (
  select o.a_id, o.b_id,
         abs(sum(o.x * o2.y - o2.x * o.y)) / 2.0 as a
  from ord o join ord o2
    on o.a_id = o2.a_id and o.b_id = o2.b_id
   and o2.i = (o.i % o.n) + 1
  where o.n >= 3
  group by o.a_id, o.b_id
)
select a_id as input_id, b_id as method_id, round(a, 6) as inter_area
from area where a > 1e-9
"""


SQRT3_3 = 0.5773502691896258  # sqrt(3)/3, binary double literal


def hex_cells_sql(
    src: str,
    size: float = 100000.0,
    cols: tuple[str, ...] = ("url", "lang"),
) -> str:
    """H3-style hexagonal binning: (*cols, hex_q, hex_r) rows from a
    source subquery `src` with lat/lon columns — pointy-top axial hex
    coordinates of cell size `size` meters over web-mercator, with the
    standard cube rounding (largest-residual coordinate re-derived so
    q+r+s == 0 holds exactly).  `cols` pass through untouched (the
    default keeps the original geo_pages (url, lang) contract).

    The hexagonal counterpart of `tile_cols` for the north rule's
    "H3-indexed" binning: same published lattice math as H3's planar
    layer (axial coords + cube round, redblobgames/Uber H3 docs), minus
    the icosahedral projection (out of scope like PROJ).  Every step is
    +,-,*,/ on IEEE doubles plus round() (ties-away in BOTH Spark and
    DuckDB), so the SAME text is the engine (codegen'd, zero-shuffle
    map) and the oracle."""
    mx, my = mercator_xy("lat", "lon")
    cl = ", ".join(cols)
    return f"""
      select {cl},
             case when dq > ds and dq > dr
                  then cast(-rs - rr as bigint)
                  else cast(rq as bigint) end as hex_q,
             case when not (dq > ds and dq > dr) and not (ds > dr)
                  then cast(-rq - rs as bigint)
                  else cast(rr as bigint) end as hex_r
      from (
        select {cl}, rq, rr, rs,
               abs(rq - qf) as dq, abs(rr - rf) as dr, abs(rs - sf) as ds
        from (
          select {cl}, qf, rf, sf,
                 round(qf) as rq, round(rf) as rr, round(sf) as rs
          from (
            select {cl}, qf, rf, (- qf - rf) as sf
            from (
              select {cl},
                     ({SQRT3_3!r} * {mx} - {my} / 3.0) / {size!r} as qf,
                     (2.0 * {my} / 3.0) / {size!r} as rf
              from ({src})
            )
          )
        )
      )
"""
