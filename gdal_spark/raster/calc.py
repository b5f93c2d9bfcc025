"""Raster calc expression dialect — the engine's analog of the
reference's muparser/exprtk expression pixel function
(apps/gdalalg_raster_calc.cpp:904-911, frmts/vrt/
vrtexpression_muparser.cpp): a free-form arithmetic expression over
named band variables, evaluated per block on float64 numpy arrays.

Grammar (muparser-compatible subset, recursive descent):

    expr     := or_
    or_      := and_ ( '||' and_ )*
    and_     := cmp ( '&&' cmp )*
    cmp      := add ( ('<' '>' '<=' '>=' '==' '!=') add )?
    add      := mul ( ('+'|'-') mul )*
    mul      := unary ( ('*'|'/'|'%') unary )*
    unary    := ('-'|'+'|'!') unary | power
    power    := atom ( '^' unary )?          # right-assoc, muparser ^
    atom     := NUMBER | NAME | NAME '(' args ')' | '(' expr ')'

Functions: sqrt log log10 exp abs sin cos tan asin acos atan floor
ceil round min max pow atan2 where(cond, a, b).  Comparisons yield
1.0/0.0 (muparser convention).  NO python eval — the AST is built by
this parser and interpreted over numpy only, so untrusted expression
strings cannot execute code.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster import model

_TOKEN = re.compile(
    r"\s*(?:(\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
    r"|\d+(?:[eE][+-]?\d+)?)|([A-Za-z_]\w*)"
    r"|(\|\||&&|<=|>=|==|!=|[-+*/%^()<>!,]))"
)

_FUNCS1 = {
    "sqrt": np.sqrt,
    "log": lambda x: np.log(np.maximum(x, 1e-300)),
    "log10": lambda x: np.log10(np.maximum(x, 1e-300)),
    "exp": np.exp,
    "abs": np.abs,
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "asin": np.arcsin,
    "acos": np.arccos,
    "atan": np.arctan,
    "floor": np.floor,
    "ceil": np.ceil,
    "round": np.round,
}
_FUNCS2 = {
    "pow": np.power,
    "atan2": np.arctan2,
    "min": np.minimum,
    "max": np.maximum,
}


def tokenize(src: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ValueError(f"calc: bad token at {src[pos:pos+10]!r}")
            break
        num, name, op = m.groups()
        if num is not None:
            out.append(("num", num))
        elif name is not None:
            out.append(("name", name))
        else:
            out.append(("op", op))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self, kind=None, val=None):
        t = self.peek()
        if (kind and t[0] != kind) or (val and t[1] != val):
            raise ValueError(f"calc: expected {val or kind}, got {t}")
        self.i += 1
        return t

    def parse(self):
        node = self.or_()
        if self.i != len(self.toks):
            raise ValueError(f"calc: trailing tokens {self.toks[self.i:]}")
        return node

    def or_(self):
        n = self.and_()
        while self.peek() == ("op", "||"):
            self.take()
            n = ("or", n, self.and_())
        return n

    def and_(self):
        n = self.cmp()
        while self.peek() == ("op", "&&"):
            self.take()
            n = ("and", n, self.cmp())
        return n

    def cmp(self):
        n = self.add()
        k, v = self.peek()
        if k == "op" and v in ("<", ">", "<=", ">=", "==", "!="):
            self.take()
            return ("cmp" + v, n, self.add())
        return n

    def add(self):
        n = self.mul()
        while self.peek()[0] == "op" and self.peek()[1] in "+-":
            _, op = self.take()
            n = (op, n, self.mul())
        return n

    def mul(self):
        n = self.unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            _, op = self.take()
            n = (op, n, self.unary())
        return n

    def unary(self):
        k, v = self.peek()
        if k == "op" and v in ("-", "+", "!"):
            self.take()
            return ("u" + v, self.unary())
        return self.power()

    def power(self):
        n = self.atom()
        if self.peek() == ("op", "^"):
            self.take()
            return ("^", n, self.unary())  # right-assoc
        return n

    def atom(self):
        k, v = self.peek()
        if k == "num":
            self.take()
            return ("lit", float(v))
        if k == "name":
            self.take()
            if self.peek() == ("op", "("):
                self.take()
                args = [self.or_()]
                while self.peek() == ("op", ","):
                    self.take()
                    args.append(self.or_())
                self.take("op", ")")
                return ("call", v, args)
            return ("var", v)
        if (k, v) == ("op", "("):
            self.take()
            n = self.or_()
            self.take("op", ")")
            return n
        raise ValueError(f"calc: unexpected {v!r}")


def parse_expr(src: str):
    return _Parser(tokenize(src)).parse()


def eval_expr(node, env: dict[str, np.ndarray]):
    op = node[0]
    if op == "lit":
        return node[1]
    if op == "var":
        if node[1] not in env:
            raise ValueError(f"calc: unknown variable {node[1]!r}")
        return env[node[1]]
    if op == "call":
        name, args = node[1], [eval_expr(a, env) for a in node[2]]
        if name == "where":
            if len(args) != 3:
                raise ValueError("calc: where(cond, a, b)")
            return np.where(np.asarray(args[0]) != 0, args[1], args[2])
        if name in _FUNCS1 and len(args) == 1:
            return _FUNCS1[name](args[0])
        if name in _FUNCS2 and len(args) == 2:
            return _FUNCS2[name](*args)
        raise ValueError(f"calc: unknown function {name}/{len(args)}")
    if op.startswith("u"):
        v = eval_expr(node[1], env)
        if op == "u-":
            return -v
        if op == "u+":
            return v
        return np.where(np.asarray(v) != 0, 0.0, 1.0)
    a = eval_expr(node[1], env)
    b = eval_expr(node[2], env)
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.asarray(a, dtype=np.float64) / b
    if op == "%":
        return np.mod(a, b)
    if op == "^":
        return np.power(a, b)
    if op == "or":
        return np.where((np.asarray(a) != 0) | (np.asarray(b) != 0), 1.0, 0.0)
    if op == "and":
        return np.where((np.asarray(a) != 0) & (np.asarray(b) != 0), 1.0, 0.0)
    if op.startswith("cmp"):
        cmp = op[3:]
        f = {
            "<": np.less,
            ">": np.greater,
            "<=": np.less_equal,
            ">=": np.greater_equal,
            "==": np.equal,
            "!=": np.not_equal,
        }[cmp]
        return np.where(f(a, b), 1.0, 0.0)
    raise ValueError(f"calc: bad node {op}")


def calc(blocks: DataFrame, expr: str, out_name: str | None = None) -> DataFrame:
    """Derived single-band raster = expr over bands b1..bN of each block
    (gdal raster calc). The expression is parsed ONCE on the driver; the
    AST broadcasts and is interpreted over float64 numpy stacks inside
    applyInPandas — one task per block, no per-pixel Python."""
    ast = parse_expr(expr)  # validate driver-side

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        env = {}
        for r in pdf.itertuples():
            env[f"b{int(r.band)}"] = model.decode(
                (r.buf, r.height, r.width, r.dtype)
            ).astype(np.float64)
        out = eval_expr(ast, env)
        r0 = pdf.iloc[0]
        h, w = int(r0.height), int(r0.width)
        out = np.broadcast_to(np.asarray(out, dtype=np.float64), (h, w))
        return pd.DataFrame(
            [
                (
                    out_name or (str(r0.dataset) + "_calc"),
                    1,
                    r0.bx,
                    r0.by,
                    r0.x0,
                    r0.y0,
                    w,
                    h,
                    "float64",
                    r0.gt0,
                    r0.gt1,
                    r0.gt2,
                    r0.gt3,
                    r0.gt4,
                    r0.gt5,
                    None,
                    np.ascontiguousarray(out).tobytes(),
                )
            ],
            columns=[c.split()[0] for c in model.BLOCK_SCHEMA.split(", ")],
        )

    return blocks.groupBy("dataset", "bx", "by").applyInPandas(
        fn, model.BLOCK_SCHEMA
    )


# --- multi-input calc (named datasets, A[band] variables) -------------------

_VAR_IDX = re.compile(r"([A-Za-z_]\w*)\s*\[\s*(\d+)\s*\]")


def _bare_name(expr: str, name: str) -> bool:
    """True if `name` occurs as a complete un-indexed variable (the
    reference's MatchIsCompleteVariableNameWithNoIndex,
    apps/gdalalg_raster_calc.cpp:60-105)."""
    return re.search(rf"(?<![\w.]){re.escape(name)}(?!\s*[\w(\[])", expr) is not None


def set_band_indices(expr: str, name: str, band: int) -> str:
    """Replace bare `name` with `name[band]`; `name[k]` is left alone
    (apps/gdalalg_raster_calc.cpp SetBandIndices: "X" -> "X[3]" but
    "X[1]" untouched)."""
    return re.sub(
        rf"(?<![\w.]){re.escape(name)}(?!\s*[\w(\[])",
        f"{name}[{band}]",
        expr,
    )


def calc_multi(
    inputs: dict[str, DataFrame],
    expr: str,
    out_name: str = "calc",
) -> DataFrame:
    """`gdal raster calc` with multiple NAMED inputs
    (apps/gdalalg_raster_calc.cpp:609,717: each input binds a variable,
    default "X"; "A[2]" reads band 2 of input A; an un-indexed name
    expands the expression per band — "X + 3" over an n-band raster
    produces n output bands, all inputs' un-indexed uses advancing in
    lockstep, which requires equal band counts like the reference).

    Distributed shape: each block table is tagged with its variable
    name, the union regroups ONCE on (bx, by) — the only exchange —
    and every output band evaluates inside one applyInPandas task per
    block.  Inputs must share the block grid; mismatched block windows
    raise (the reference re-grids mismatched extents via its VRT
    machinery — out of scope, grids here come from the same table
    model)."""
    if not inputs:
        raise ValueError("calc_multi: no inputs")
    # band inventory per input (k rows per raster)
    bands: dict[str, list[int]] = {}
    for nm, df in inputs.items():
        rows = df.select("band").distinct().collect()  # bounded-metadata: k band ids
        bands[nm] = sorted(int(r["band"]) for r in rows)

    # indexed uses must reference existing bands
    for nm, b in _VAR_IDX.findall(expr):
        if nm in bands and int(b) not in bands[nm]:
            raise ValueError(f"calc_multi: {nm}[{b}] not in {bands[nm]}")

    bare = [nm for nm in inputs if _bare_name(expr, nm)]
    if bare:
        counts = {len(bands[nm]) for nm in bare}
        if len(counts) != 1:
            raise ValueError(
                "calc_multi: un-indexed variables need equal band counts "
                f"({ {nm: len(bands[nm]) for nm in bare} })"
            )
        n_out = counts.pop()
        per_band = []
        for i in range(n_out):
            e = expr
            for nm in bare:
                e = set_band_indices(e, nm, bands[nm][i])
            per_band.append(e)
    else:
        per_band = [expr]

    # A[2] -> flat names the tokenizer accepts, parsed ONCE driver-side
    asts = [
        parse_expr(_VAR_IDX.sub(r"\1__\2", e)) for e in per_band
    ]

    first = next(iter(inputs.values()))
    cols = [c.split()[0] for c in model.BLOCK_SCHEMA.split(", ")]
    tagged = None
    for nm, df in inputs.items():
        t = df.select(F.lit(nm).alias("vname"), *cols)
        tagged = t if tagged is None else tagged.unionByName(t)

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        env = {}
        shape = None
        r0 = pdf.iloc[0]
        for r in pdf.itertuples():
            a = model.decode((r.buf, r.height, r.width, r.dtype)).astype(
                np.float64
            )
            if shape is None:
                shape = a.shape
            elif a.shape != shape or (r.x0, r.y0) != (r0.x0, r0.y0):
                raise ValueError(
                    "calc_multi: inputs disagree on the block grid"
                )
            env[f"{r.vname}__{int(r.band)}"] = a
        out_rows = []
        for i, ast in enumerate(asts):
            out = eval_expr(ast, env)
            out = np.broadcast_to(
                np.asarray(out, dtype=np.float64), shape
            )
            out_rows.append(
                (
                    out_name,
                    i + 1,
                    int(key[0]),
                    int(key[1]),
                    int(r0.x0),
                    int(r0.y0),
                    shape[1],
                    shape[0],
                    "float64",
                    r0.gt0,
                    r0.gt1,
                    r0.gt2,
                    r0.gt3,
                    r0.gt4,
                    r0.gt5,
                    None,
                    np.ascontiguousarray(out).tobytes(),
                )
            )
        return pd.DataFrame(out_rows, columns=cols)

    # one exchange on (bx, by); the vname tag rides into the kernel
    out_schema = model.BLOCK_SCHEMA
    return (
        tagged.groupBy("bx", "by")
        .applyInPandas(
            lambda key, pdf: fn(key, pdf), out_schema
        )
    )
