"""ExecuteSQL compatibility shim — run OGR-SQL-dialect statements on
registered layers (GDALDataset::ExecuteSQL parity at the statement
level, gcore/gdaldataset.cpp:7383-7560).

Spark SQL is a strict superset of the OGR dialect (SURVEY §3.1: stages
3-5 of ExecuteSQL ≅ Catalyst parse/analyze/optimize), so the shim only
has to bridge the OGR-specific surface:

- special fields FID, OGR_GEOMETRY, OGR_GEOM_WKT, OGR_GEOM_AREA
  (ogr/ogr_p.h:167-174) → fid column / geometry-type literal / ST_ calls
  on the WKB geometry column;
- OGR's LIKE is case-INSENSITIVE (swq_op_general.cpp SwqGeneralEvaluator
  LIKE path) → token-aware rewrite to Spark `ilike` (string literals are
  never touched);
- OGR_STYLE → the layer's `ogr_style` column when it carries one
  (ogr/ogr_featurestyle.h feature styles; functions/style.py parses the
  PEN/BRUSH/SYMBOL/LABEL style-string grammar), else a typed NULL;
- the OGR first-match JOIN rule (one output row per left feature, the
  secondary row with the LOWEST FID wins — ogr_gensql.cpp join
  evaluation) is applied to single `LEFT JOIN ... ON` statements via a
  row_number-over-fid rewrite when first_match_join=True;
- everything else (WHERE op set, summary aggregates, DISTINCT,
  ORDER BY/LIMIT/OFFSET, UNION ALL) parses as-is.

Usage:
    execute_sql(spark, "select FID, OGR_GEOM_AREA from poly where ...",
                layers={"poly": polygons_df})
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from gdal_spark.functions import register_st_functions

_SPECIAL = {
    "ogr_geom_wkt": "st_astext(geometry)",
    "ogr_geom_area": "st_area(geometry)",
    "ogr_geometry": "st_geometrytype(geometry)",
    "ogr_style": "cast(null as string)",
    "fid": "fid",
}

# Token stream: quoted literals survive untouched, words get mapped.
# Numbers and multi-char comparison operators are explicit token classes so
# `pop >= 1000` / `2.5e3` pass through byte-identical (they used to shatter
# into single chars under the old \S fallback).
_TOKENS = re.compile(
    r"'(?:[^']|'')*'"  # single-quoted string literal ('' escape)
    r"|\"[^\"]*\""  # double-quoted identifier
    r"|\d+\.?\d*(?:[eE][+-]?\d+)?"  # numeric literal
    r"|\.\d+(?:[eE][+-]?\d+)?"  # .5-style numeric literal
    r"|<=|>=|<>|!=|\|\||&&"  # multi-char operators
    r"|[A-Za-z_][A-Za-z_0-9.]*"  # identifier / keyword
    r"|\S"  # any other single char
)


def rewrite(sql: str, ogr_like: bool = True, style_col: bool = False) -> str:
    """OGR dialect → Spark SQL, token-aware: special fields
    (ogr/ogr_p.h:167-174) map to engine expressions, LIKE becomes the
    case-insensitive `ilike` (the OGR default), and string literals are
    never rewritten. Output is rebuilt from original spans, so whitespace
    and untouched tokens keep their exact source form."""
    out = []
    last = 0
    for m in _TOKENS.finditer(sql):
        t = m.group(0)
        repl = None
        if t[0] not in "'\"":
            low = t.lower()
            if low in _SPECIAL:
                repl = "ogr_style" if (
                    style_col and low == "ogr_style"
                ) else _SPECIAL[low]
            elif ogr_like and low in ("like", "ilike"):
                repl = "ilike"
        if repl is not None:
            out.append(sql[last : m.start()])
            out.append(repl)
            last = m.end()
    out.append(sql[last:])
    return "".join(out)


_FIRST_MATCH = re.compile(
    r"^\s*select\s+(?P<cols>.*?)\s+from\s+(?P<left>\w+)\s+left\s+join\s+"
    r"(?P<right>\w+)\s+on\s+(?P<cond>.*?)"
    r"(?P<rest>\s+(?:where|group|order|limit)\b.*)?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def rewrite_first_match(sql: str) -> str | None:
    """Single LEFT JOIN → OGR first-match semantics: exactly one output
    row per left feature, the matching secondary row with the lowest FID
    (ogr/ogrsf_frmts/generic/ogr_gensql.cpp join rule). Returns None if
    the statement doesn't have that shape."""
    m = _FIRST_MATCH.match(sql)
    if not m:
        return None
    cols, lt, rt = m.group("cols"), m.group("left"), m.group("right")
    cond, rest = m.group("cond"), (m.group("rest") or "").strip()
    where, tail = "", rest
    if rest.lower().startswith("where"):
        # OGR restricts a join statement's WHERE to primary-table fields
        # (ogr_gensql.cpp), so it is evaluated inside the subquery — before
        # the first-match window, which left-row filters cannot perturb.
        # GROUP/ORDER/LIMIT/OFFSET stay outside (they see the output
        # aliases, as in standard SQL over a derived table).
        clause = re.search(
            r"\b(group\s+by|order\s+by|limit|offset)\b", rest[5:], re.IGNORECASE
        )
        cut = 5 + (clause.start() if clause else len(rest) - 5)
        where = " where " + rest[5:cut].strip()
        tail = rest[cut:].strip()
    return (
        f"select * except (__rn) from (select {cols}, row_number() over "
        f"(partition by {lt}.fid order by {rt}.fid) as __rn "
        f"from {lt} left join {rt} on {cond}{where}) where __rn = 1 {tail}"
    )


def split_union_all(sql: str) -> list[str]:
    """Split a chained multi-select statement at TOP-LEVEL `UNION ALL`
    boundaries (GDALDataset::ExecuteSQL builds these as a linked list of
    swq_select, gcore/gdaldataset.cpp:7531-7560). Parenthesized
    sub-selects and string literals are respected via the shim
    tokenizer."""
    parts: list[str] = []
    depth = 0
    last = 0
    toks = list(_TOKENS.finditer(sql))
    i = 0
    while i < len(toks):
        t = toks[i].group(0)
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif (
            depth == 0
            and t.lower() == "union"
            and i + 1 < len(toks)
            and toks[i + 1].group(0).lower() == "all"
        ):
            parts.append(sql[last : toks[i].start()])
            last = toks[i + 1].end()
            i += 2
            continue
        i += 1
    parts.append(sql[last:])
    return [p.strip() for p in parts]


# --------------------------------------------------------------------------
# DDL fast-paths (gcore/gdaldataset.cpp:7435-7515 — CREATE/DROP INDEX,
# DROP TABLE, ALTER TABLE dispatched by string inspection BEFORE the
# select parser, returning no result set).  Our layers are temp views
# over immutable DataFrames, so every ALTER re-registers the view with
# the transformed frame; CREATE INDEX re-registers the view sorted
# within partitions by the indexed column — the Spark analog of an
# attribute index (enables parquet min/max row-group skipping on any
# subsequent write) — and records it in a session registry that DROP
# INDEX clears.
# --------------------------------------------------------------------------

# OGR column types (ogr_core.h OGRFieldType surface) → Spark SQL types
_OGR_TYPES = {
    "integer": "int",
    "int": "int",
    "smallint": "short",
    "bigint": "long",
    "integer64": "long",
    "float": "double",
    "real": "double",
    "double": "double",
    "numeric": "decimal(38,18)",
    "string": "string",
    "varchar": "string",
    "character": "string",
    "char": "string",
    "text": "string",
    "date": "date",
    "time": "string",
    "timestamp": "timestamp",
    "datetime": "timestamp",
    "boolean": "boolean",
}

_INDEXES: dict[str, dict[str, str]] = {}  # view name -> {column: column}


def _spark_type(ogr_type: str) -> str:
    base = re.match(r"[a-z]+", ogr_type.strip().lower())
    t = base.group(0) if base else ""
    if t not in _OGR_TYPES:
        raise ValueError(f"unknown column type {ogr_type!r}")
    m = re.match(r"numeric\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", ogr_type.lower())
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return _OGR_TYPES[t]


def execute_ddl(spark: SparkSession, sql: str) -> bool:
    """Handle one DDL statement; True if it was DDL (no result set),
    False to fall through to the select path.  Statement shapes match
    the reference tokenizer exactly:

      CREATE INDEX ON <layer> USING <column>      (gdaldataset.cpp:6656)
      DROP INDEX ON <layer> [USING <column>]      (:6741)
      DROP TABLE <layer>                          (:6842)
      ALTER TABLE <l> ADD [COLUMN] <c> <type>     (:6961)
      ALTER TABLE <l> DROP [COLUMN] <c>           (:7052)
      ALTER TABLE <l> RENAME [COLUMN] <a> TO <b>  (:7152)
      ALTER TABLE <l> ALTER [COLUMN] <c> TYPE <t> (:7241)
      ALTER TABLE <src> RENAME TO <dst>           (:7481)
    """
    from pyspark.sql import functions as F

    toks = sql.split()
    low = [t.lower() for t in toks]

    def view(name: str) -> DataFrame:
        return spark.table(name)

    def put(name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    if low[:3] == ["create", "index", "on"] and len(toks) >= 6 and low[4] == "using":
        layer, col = toks[3], toks[5]
        df = view(layer)
        if col not in df.columns:
            raise ValueError(f"no column {col!r} in layer {layer!r}")
        put(layer, df.sortWithinPartitions(col))
        _INDEXES.setdefault(layer, {})[col] = col
        return True
    if low[:3] == ["drop", "index", "on"] and len(toks) >= 4:
        layer = toks[3]
        if len(toks) >= 6 and low[4] == "using":
            _INDEXES.get(layer, {}).pop(toks[5], None)
        else:
            _INDEXES.pop(layer, None)
        return True
    if low[:2] == ["drop", "table"] and len(toks) >= 3:
        spark.catalog.dropTempView(toks[2])
        _INDEXES.pop(toks[2], None)
        return True
    if low[:2] != ["alter", "table"] or len(toks) < 4:
        return False
    layer = toks[2]
    verb = low[3]
    rest = toks[4:]
    if verb == "rename" and len(rest) >= 2 and rest[0].lower() == "to":
        df = view(layer)
        put(rest[1], df)
        spark.catalog.dropTempView(layer)
        _INDEXES[rest[1]] = _INDEXES.pop(layer, {})
        return True
    if rest and rest[0].lower() == "column":
        rest = rest[1:]
    if verb == "add" and len(rest) >= 2:
        col, ogr_type = rest[0], " ".join(rest[1:])
        put(
            layer,
            view(layer).withColumn(
                col, F.lit(None).cast(_spark_type(ogr_type))
            ),
        )
        return True
    if verb == "drop" and len(rest) >= 1:
        put(layer, view(layer).drop(rest[0]))
        return True
    if verb == "rename" and len(rest) >= 3 and rest[1].lower() == "to":
        put(layer, view(layer).withColumnRenamed(rest[0], rest[2]))
        return True
    if verb == "alter" and len(rest) >= 3 and rest[1].lower() == "type":
        col, ogr_type = rest[0], " ".join(rest[2:])
        df = view(layer)
        put(
            layer,
            df.withColumn(col, F.col(col).cast(_spark_type(ogr_type))),
        )
        return True
    raise ValueError(f"Unsupported ALTER TABLE command : {sql}")


def execute_sql(
    spark: SparkSession,
    sql: str,
    layers: dict[str, DataFrame] | None = None,
    fid_col: str | None = None,
    first_match_join: bool = False,
    ogr_like: bool = True,
    parser: bool = True,
) -> DataFrame | None:
    """Register layers as views (adding a `fid` column from fid_col or a
    monotonically-increasing id if absent), rewrite special fields, run.
    DDL statements (CREATE/DROP INDEX, DROP TABLE, ALTER TABLE) take the
    reference's string fast-paths and return None — no result set
    (gcore/gdaldataset.cpp:7435-7515 returns nullptr for these).
    """
    from pyspark.sql import functions as F

    register_st_functions(spark)
    for name, df in (layers or {}).items():
        if "fid" not in df.columns:
            if fid_col and fid_col in df.columns:
                df = df.withColumn("fid", F.col(fid_col))
            else:
                first = df.columns[0]
                df = df.withColumn("fid", F.col(first).cast("long"))
        df.createOrReplaceTempView(name)
    if execute_ddl(spark, sql.strip()):
        return None
    # OGR_STYLE resolves to the real per-feature style column when any
    # registered layer carries one (ogr/ogr_featurestyle.h; layers
    # without it keep the reference's typed-NULL behavior)
    style_col = any(
        "ogr_style" in df.columns for df in (layers or {}).values()
    )
    if parser:
        # full recursive-descent parse of the OGR dialect
        # (gdal_spark.ogrsql_parser, grammar per ogr/swq_parser.y):
        # validates the statement and rejects out-of-dialect constructs
        # exactly like swq; the token rewrite remains as parser=False.
        from gdal_spark.ogrsql_parser import parse_ogr_sql

        text = parse_ogr_sql(sql, ogr_like=ogr_like, style_col=style_col)
    else:
        text = rewrite(sql, ogr_like=ogr_like, style_col=style_col)
    if first_match_join:
        # apply the first-match rewrite per UNION ALL branch (the chained
        # swq_select shape, gcore/gdaldataset.cpp:7531-7560)
        branches = split_union_all(text)
        rewritten = [rewrite_first_match(b) or b for b in branches]
        if any(r is not b for r, b in zip(rewritten, branches)):
            return spark.sql(" union all ".join(rewritten))
    return spark.sql(text)
