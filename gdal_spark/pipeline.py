"""`gdal pipeline` analog: '!'-separated step chains compiled onto the
engine's DataFrame operators.

Reference parity:
- step chaining + separators ('!' or '|'):
  apps/gdalalg_abstract_pipeline.cpp:284,501 and
  apps/gdalalg_pipeline.cpp (mixed raster/vector step dispatch)
- `tee` (side write, main chain continues): apps/gdalalg_tee.cpp
- `materialize` (checkpoint an intermediate dataset to storage and
  reopen it): apps/gdalalg_materialize.cpp
- serialized pipelines (--pipeline=file.json with a "pipeline" string):
  apps/gdalalg_abstract_pipeline.cpp:273-320

Spark-first design: a parsed pipeline IS the Catalyst logical plan —
every step is a lazy DataFrame transformation, so a `filter` or
`select` written anywhere in the chain still reaches the parquet scan
as a pushed predicate / pruned column list; nothing is evaluated until
the terminal `write` (or the caller's action).  The two non-lazy steps
are explicit barriers by contract: `materialize` cuts the plan exactly
like the reference's on-disk materialization (write parquet + reopen —
the resumable form; with no path it persists + counts), and `tee`
persists the prefix so the side write and the main chain share one
scan instead of recomputing the upstream twice.
"""

from __future__ import annotations

import shlex

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEOM = "geometry"


def parse_pipeline(text: str) -> list[list[str]]:
    """Tokenize shell-style and split on '!' / '|' step separators
    (apps/gdalalg_abstract_pipeline.cpp:501 accepts both).  Returns one
    token list per step; empty steps (doubled separators) are
    rejected like the reference's step-marker validation."""
    steps: list[list[str]] = [[]]
    for tok in shlex.split(text):
        if tok in ("!", "|"):
            if not steps[-1]:
                raise ValueError("empty pipeline step")
            steps.append([])
        else:
            steps[-1].append(tok)
    if not steps[-1]:
        raise ValueError("trailing pipeline separator")
    return steps


def _opts(tokens: list[str]) -> tuple[list[str], dict[str, str]]:
    """Split step tokens into positionals and --key[=value] options.
    Flags without a value (e.g. --preserve-topology) map to ''."""
    pos: list[str] = []
    opts: dict[str, str] = {}
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t.startswith("--"):
            if "=" in t:
                k, v = t[2:].split("=", 1)
                opts[k] = v
            elif i + 1 < len(tokens) and not tokens[i + 1].startswith("--"):
                opts[t[2:]] = tokens[i + 1]
                i += 1
            else:
                opts[t[2:]] = ""
        else:
            pos.append(t)
        i += 1
    return pos, opts


def _floats(csv: str) -> list[float]:
    return [float(v) for v in csv.split(",")]


def _bbox_where(bbox: str, geom: str) -> str:
    """Envelope-intersects predicate (the reference's vector filter
    --bbox sets a spatial filter, ogr/ogrlayer.cpp SetSpatialFilterRect:
    envelope intersection, not exact geometry intersection)."""
    x0, y0, x1, y1 = _floats(bbox)
    return (
        f"st_xmax({geom}) >= {x0} and st_xmin({geom}) <= {x1} "
        f"and st_ymax({geom}) >= {y0} and st_ymin({geom}) <= {y1}"
    )


def _bbox_wkt(bbox: str) -> str:
    x0, y0, x1, y1 = _floats(bbox)
    return (
        f"POLYGON(({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
    )


# --- vector steps ------------------------------------------------------


def _v_read(spark, sf_dir, pos, opts):
    from gdal_spark import tables

    name = pos[0]
    if name.endswith(".parquet") or "/" in name:
        return spark.read.parquet(name)
    tables.register_views(spark, sf_dir)
    return spark.table(name)


def _v_filter(df, pos, opts):
    if "where" in opts:
        df = df.where(opts["where"])
    if "bbox" in opts:
        df = df.where(F.expr(_bbox_where(opts["bbox"], opts.get("geom", GEOM))))
    return df


def _v_select(df, pos, opts):
    if "fields" in opts:
        return df.select(*[c.strip() for c in opts["fields"].split(",")])
    if "exclude" in opts:
        drop = {c.strip() for c in opts["exclude"].split(",")}
        return df.select(*[c for c in df.columns if c not in drop])
    raise ValueError("select: pass --fields or --exclude")


def _v_sort(df, pos, opts):
    cols = []
    for c in opts["by"].split(","):
        c = c.strip()
        cols.append(F.col(c[1:]).desc() if c.startswith("-") else F.col(c))
    return df.orderBy(*cols)


def _v_geom_expr(df, sql_fmt, geom):
    """Rewrite the geometry column through an ST expression; all other
    columns pass through (the per-step shape of every reference
    geometry-edit step)."""
    return df.withColumn(geom, F.expr(sql_fmt.format(g=geom)))


def run_vector_pipeline(
    spark: SparkSession,
    text: str,
    sf_dir: str | None = None,
    input_df: DataFrame | None = None,
    geom: str = GEOM,
) -> DataFrame:
    """Execute a `gdal vector pipeline` step chain.  Steps:

    read <table|path> | filter [--where E] [--bbox x0,y0,x1,y1] |
    select --fields a,b / --exclude a,b | sql <stmt> | sort --by f,-g |
    limit N | make-point --x cx --y cy | reproject --dst-crs C |
    swap-xy | segmentize --max-length V | simplify --tolerance V
    [--preserve-topology] | buffer --distance V [--style S] |
    make-valid | geom set-type --multi | set-field-type --field F
    --type T | explode-collections | clip --bbox x0,y0,x1,y1 |
    tee <path> | materialize [path] | write <path> [--partition-by f]
    [--feature-limit N] [--scheme hive|flat]

    Unknown step names raise, mirroring the reference's step
    validation (apps/gdalalg_abstract_pipeline.cpp GetStepAlg)."""
    from gdal_spark.functions.st import (
        register_extra_st,
        register_st_functions,
    )

    register_st_functions(spark)
    register_extra_st(spark)
    df = input_df
    for tokens in parse_pipeline(text):
        name, rest = tokens[0], tokens[1:]
        pos, opts = _opts(rest)
        g = opts.get("geom", geom)
        if name == "read":
            df = _v_read(spark, sf_dir, pos, opts)
            continue
        if df is None:
            raise ValueError("pipeline must start with a read step")
        if name == "filter":
            df = _v_filter(df, pos, opts)
        elif name == "select":
            df = _v_select(df, pos, opts)
        elif name == "sql":
            from gdal_spark.ogrsql import execute_sql

            df = execute_sql(spark, pos[0], layers={"input": df})
        elif name == "sort":
            df = _v_sort(df, pos, opts)
        elif name == "limit":
            df = df.limit(int(pos[0]))
        elif name == "make-point":
            df = df.withColumn(
                g, F.expr(f"st_makepoint({opts['x']}, {opts['y']})")
            )
        elif name == "reproject":
            from gdal_spark.operators.reproject import vector_reproject

            df = vector_reproject(df, opts["dst-crs"], geom_col=g)
        elif name == "swap-xy":
            df = _v_geom_expr(df, "st_swapxy({g})", g)
        elif name == "segmentize":
            df = _v_geom_expr(
                df, f"st_segmentize({{g}}, {float(opts['max-length'])})", g
            )
        elif name == "simplify":
            fn = (
                "st_simplifypreservetopology"
                if "preserve-topology" in opts
                else "st_simplify"
            )
            df = _v_geom_expr(
                df, f"{fn}({{g}}, {float(opts['tolerance'])})", g
            )
        elif name == "buffer":
            d = float(opts["distance"])
            if "style" in opts:
                df = _v_geom_expr(
                    df, f"st_buffer_style({{g}}, {d}, '{opts['style']}')", g
                )
            else:
                df = _v_geom_expr(df, f"st_buffer({{g}}, {d})", g)
        elif name == "make-valid":
            df = _v_geom_expr(df, "st_makevalid({g})", g)
        elif name == "geom" and pos[:1] == ["set-type"]:
            if "multi" not in opts:
                raise ValueError("geom set-type: only --multi is supported")
            df = _v_geom_expr(df, "st_multi({g})", g)
        elif name == "set-field-type":
            df = df.withColumn(
                opts["field"], F.col(opts["field"]).cast(opts["type"])
            )
        elif name == "explode-collections":
            from gdal_spark.operators.layer_algebra import explode_collections

            df = explode_collections(df, geom_col=g)
        elif name == "clip":
            # keep intersecting features, geometry clipped to the bbox
            # (apps/gdalalg_vector_clip.cpp semantics)
            wkt = _bbox_wkt(opts["bbox"])
            df = (
                df.where(F.expr(_bbox_where(opts["bbox"], g)))
                .withColumn(
                    g,
                    F.expr(
                        f"st_intersection({g}, st_geomfromtext('{wkt}'))"
                    ),
                )
                .where(F.col(g).isNotNull())
            )
        elif name == "tee":
            df = df.persist()
            df.write.mode("overwrite").parquet(pos[0])
        elif name == "materialize":
            df = _materialize(spark, df, pos[0] if pos else None)
        elif name == "write":
            df = _v_write(df, pos[0], opts)
        else:
            raise ValueError(f"unknown vector pipeline step: {name}")
    if df is None:
        raise ValueError("empty pipeline")
    return df


def _materialize(spark, df, path):
    if path:
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    df = df.persist()
    df.count()
    return df


def _v_write(df, path, opts):
    if "partition-by" in opts:
        from gdal_spark.operators.checkpoint import write_vector_partitioned

        write_vector_partitioned(
            df.drop(GEOM) if GEOM in df.columns and "keep-geom" not in opts
            else df,
            path,
            [c.strip() for c in opts["partition-by"].split(",")],
            order_col=df.columns[0],
            scheme=opts.get("scheme", "hive"),
            feature_limit=(
                int(opts["feature-limit"]) if "feature-limit" in opts else None
            ),
            max_file_size=(
                int(opts["max-file-size"]) if "max-file-size" in opts else None
            ),
        )
        return df
    df.write.mode("overwrite").parquet(path)
    return df


# --- raster steps ------------------------------------------------------

_SPECS = {
    "grad100": "grad100_spec",
    "plane": "plane_spec",
    "plateau": "plateau_spec",
    "checker": "checker_spec",
}

_FOCAL_OPS = {
    "hillshade", "slope", "aspect", "tri", "tpi", "roughness",
}


def _raster_dims(blocks: DataFrame) -> tuple[int, int]:
    r = blocks.agg(
        F.max(F.col("x0") + F.col("width")).alias("w"),
        F.max(F.col("y0") + F.col("height")).alias("h"),
    ).first()  # bounded-metadata: raster dims
    return int(r["w"]), int(r["h"])


def run_raster_pipeline(
    spark: SparkSession,
    text: str,
    input_blocks: DataFrame | None = None,
) -> DataFrame:
    """Execute a `gdal raster pipeline` step chain over the block
    table.  Steps:

    read <spec|path> | hillshade|slope|aspect|tri|tpi|roughness |
    translate --srcwin x,y,w,h [--ot T] [--bands 1,2] [--scale a,b] |
    scale --dst-min A --dst-max B [--src-min a --src-max b] |
    resize --size W,H [--method M] | reclassify --map "1=2,3=4"
    [--default D] | calc --expr E | select --bands 1,2 |
    tee <path> | materialize [path] | write <path>

    Raster→vector conversion steps (registered in the reference's
    mixed pipeline, apps/gdalalg_pipeline.cpp includes): polygonize
    [--band N] | footprint [--band N] [--nodata V] | contour --levels
    a,b,c | as-features — after one of these the rows are features,
    not blocks, so only tee/materialize/write may follow.

    `read` accepts a synthetic GridSpec name (the engine's raster
    sources are tables, SURVEY §2.1) or a parquet block-table path."""
    from gdal_spark.raster import calc as rcalc
    from gdal_spark.raster import model, ops

    blocks = input_blocks
    for tokens in parse_pipeline(text):
        name, rest = tokens[0], tokens[1:]
        pos, opts = _opts(rest)
        if name == "read":
            if pos[0] in _SPECS:
                spec = getattr(model, _SPECS[pos[0]])()
                blocks = model.synth_blocks(spark, spec)
            else:
                blocks = spark.read.parquet(pos[0])
            continue
        if blocks is None:
            raise ValueError("pipeline must start with a read step")
        if name in _FOCAL_OPS:
            from gdal_spark.raster.focal import focal

            blocks = focal(blocks, name)
        elif name == "translate":
            x, y, w, h = (int(v) for v in opts["srcwin"].split(","))
            blocks = ops.translate(
                blocks,
                (x, y, w, h),
                ot=opts.get("ot"),
                scale=(
                    tuple(_floats(opts["scale"])) if "scale" in opts else None
                ),
                bands=(
                    [int(b) for b in opts["bands"].split(",")]
                    if "bands" in opts
                    else None
                ),
            )
        elif name == "scale":
            blocks = ops.scale_minmax(
                blocks,
                float(opts["dst-min"]),
                float(opts["dst-max"]),
                src_min=(
                    float(opts["src-min"]) if "src-min" in opts else None
                ),
                src_max=(
                    float(opts["src-max"]) if "src-max" in opts else None
                ),
            )
        elif name == "resize":
            w, h = (int(v) for v in opts["size"].split(","))
            blocks = ops.resize(
                blocks, w, h, method=opts.get("method", "nearest")
            )
        elif name == "reclassify":
            mapping = {
                int(k): int(v)
                for k, v in (
                    pair.split("=") for pair in opts["map"].split(",")
                )
            }
            blocks = ops.reclassify(
                blocks, mapping, default=int(opts.get("default", 0))
            )
        elif name == "calc":
            blocks = rcalc.calc(blocks, opts["expr"])
        elif name == "select":
            bands = [int(b) for b in opts["bands"].split(",")]
            blocks = blocks.where(F.col("band").isin(bands))
        elif name == "polygonize":
            from gdal_spark.raster.polygonize import polygonize

            w, _h = _raster_dims(blocks)
            blocks = polygonize(blocks, w, band=int(opts.get("band", 1)))
        elif name == "footprint":
            from gdal_spark.raster.polygonize import footprint

            w, h = _raster_dims(blocks)
            blocks = footprint(
                blocks,
                w,
                h,
                band=int(opts.get("band", 1)),
                nodata=float(opts.get("nodata", 0.0)),
            )
        elif name == "contour":
            from gdal_spark.raster.contour import (
                contour_polylines,
                contour_segments,
            )

            w, h = _raster_dims(blocks)
            blocks = contour_polylines(
                contour_segments(blocks, _floats(opts["levels"]), w, h)
            )
        elif name == "as-features":
            blocks = ops.as_features(blocks)
        elif name == "tee":
            blocks = blocks.persist()
            blocks.write.mode("overwrite").parquet(pos[0])
        elif name == "materialize":
            blocks = _materialize(spark, blocks, pos[0] if pos else None)
        elif name == "write":
            blocks.write.mode("overwrite").parquet(pos[0])
        else:
            raise ValueError(f"unknown raster pipeline step: {name}")
    if blocks is None:
        raise ValueError("empty pipeline")
    return blocks


def run_pipeline_json(
    spark: SparkSession, doc: dict, sf_dir: str | None = None
) -> DataFrame:
    """Serialized-pipeline entry point: {"pipeline": "<step chain>",
    "type": "vector"|"raster"} — the reference reads the same shape
    from --pipeline=file.json (apps/gdalalg_abstract_pipeline.cpp:
    273-320; its JSON carries the command line string)."""
    kind = doc.get("type", "vector")
    if kind == "raster":
        return run_raster_pipeline(spark, doc["pipeline"])
    return run_vector_pipeline(spark, doc["pipeline"], sf_dir=sf_dir)
