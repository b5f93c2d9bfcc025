"""OGR feature style strings (ogr/ogr_featurestyle.h — style tools
PEN/BRUSH/SYMBOL/LABEL with key:value params, e.g.
``PEN(c:#FF0000,w:5px);BRUSH(fc:#0000FF)``; OGRStyleMgr splits tool
parts on ';', OGRStyleTool::Parse splits params on ',' outside
quotes).  Re-implemented as a small tokenizer + Arrow-batched Spark
functions so per-feature style strings become queryable columns
instead of the typed NULL the shim used to return.

Units follow the reference's suffix set (ogr_featurestyle.h
OGRSTUnitId): g ground, px pixel, pt points, mm, cm, in.
"""

from __future__ import annotations

import re

import numpy as np  # noqa: F401  (kept for parity with sibling modules)
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

_TOOL = re.compile(r"\s*([A-Za-z]+)\s*\(")

# unit suffix → multiplier to pixels at the reference's default scale
# (OGRStyleTool::ComputeWithUnit with 72 dpi ground scale 1)
_UNITS = {
    "px": 1.0,
    "pt": 1.0,  # 1pt = 1px at 72 dpi
    "mm": 72.0 / 25.4,
    "cm": 72.0 / 2.54,
    "in": 72.0,
    "g": 1.0,
}


def parse_style_string(s: str | None) -> list[tuple[str, dict[str, str]]]:
    """``PEN(c:#FF0000,w:5px);LABEL(t:"a,b")`` →
    [("PEN", {"c": "#FF0000", "w": "5px"}), ("LABEL", {"t": "a,b"})].
    Quoted values keep commas/parens; '\\"' escapes a quote inside."""
    out: list[tuple[str, dict[str, str]]] = []
    if not s:
        return out
    i = 0
    n = len(s)
    while i < n:
        m = _TOOL.match(s, i)
        if not m:
            break
        tool = m.group(1).upper()
        i = m.end()
        params: dict[str, str] = {}
        key: list[str] = []
        val: list[str] = []
        in_val = False
        quoted = False
        while i < n:
            ch = s[i]
            if quoted:
                if ch == "\\" and i + 1 < n and s[i + 1] == '"':
                    val.append('"')
                    i += 2
                    continue
                if ch == '"':
                    quoted = False
                else:
                    val.append(ch)
                i += 1
                continue
            if ch == '"' and in_val:
                quoted = True
                i += 1
                continue
            if ch == ":" and not in_val:
                in_val = True
                i += 1
                continue
            if ch in ",)":
                if key:
                    params["".join(key).strip().lower()] = "".join(val)
                key, val = [], []
                in_val = False
                i += 1
                if ch == ")":
                    break
                continue
            (val if in_val else key).append(ch)
            i += 1
        out.append((tool, params))
        while i < n and s[i] in "; \t":
            i += 1
    return out


def style_param(s: str | None, tool: str, key: str) -> str | None:
    """GetParamStr role: first matching tool part's param, raw."""
    for t, params in parse_style_string(s):
        if t == tool.upper() and key.lower() in params:
            return params[key.lower()]
    return None


def style_param_px(s: str | None, tool: str, key: str) -> float | None:
    """GetParamDbl role: numeric param converted to pixels by its unit
    suffix (default px)."""
    raw = style_param(s, tool, key)
    if raw is None:
        return None
    m = re.match(r"\s*([-+]?\d*\.?\d+(?:[eE][+-]?\d+)?)\s*([a-z]*)", raw)
    if not m:
        return None
    num = float(m.group(1))
    return num * _UNITS.get(m.group(2) or "px", 1.0)


def style_tools(s: str | None) -> str | None:
    """Comma-joined tool names in order (OGRStyleMgr::GetPartCount
    surface, SQL-friendly as a string)."""
    parts = parse_style_string(s)
    return ",".join(t for t, _ in parts) if parts else None


def register_style_functions(spark: SparkSession) -> None:
    """ogr_style_tools(style), ogr_style_param(style, tool, key),
    ogr_style_param_px(style, tool, key) as Arrow-batched UDFs."""
    reg = spark.udf.register

    def _tools(col):
        return pd.Series([style_tools(v) for v in col])

    def _param(col, tool, key):
        return pd.Series(
            [style_param(v, t, k) for v, t, k in zip(col, tool, key)]
        )

    def _param_px(col, tool, key):
        return pd.Series(
            [style_param_px(v, t, k) for v, t, k in zip(col, tool, key)],
            dtype="float64",
        )

    reg("ogr_style_tools", F.pandas_udf(_tools, StringType()))
    reg("ogr_style_param", F.pandas_udf(_param, StringType()))
    reg("ogr_style_param_px", F.pandas_udf(_param_px, DoubleType()))
