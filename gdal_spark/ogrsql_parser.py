"""Recursive-descent parser for the OGR SQL dialect → Spark SQL.

Grammar transcribed from the PUBLIC grammar surface of the reference's
swq parser (ogr/swq_parser.y token set + the documented OGR SQL dialect):

    select_stmt  := SELECT [DISTINCT] select_list FROM table_ref
                    {join_clause} [WHERE expr] [ORDER BY sort_list]
                    [LIMIT n [OFFSET m]]
                    { UNION ALL select_stmt }
    select_list  := '*' [EXCEPT|EXCLUDE '(' ident {',' ident} ')']
                  | sel_item {',' sel_item}
    sel_item     := expr [[AS] ident]
    join_clause  := [LEFT] JOIN table_ref ON expr
    expr         := or-chain of AND-chains of NOT/predicates
    predicate    := addsub [cmp addsub | [NOT] LIKE/ILIKE addsub
                    [ESCAPE string] | [NOT] IN '(' expr {',' expr} ')'
                    | [NOT] BETWEEN addsub AND addsub | IS [NOT] NULL]
    addsub       := muldiv {('+'|'-'|'||') muldiv}
    muldiv       := unary {('*'|'/'|'%') unary}
    unary        := ['-'] primary
    primary      := literal | CAST '(' expr AS type ')'
                  | ident '(' [DISTINCT] args ')' | [ident '.'] ident
                  | '(' expr ')' | '*' (inside COUNT)

Emission applies the OGR semantics the token shim used to approximate:
LIKE is case-insensitive by default (→ `ilike`), special fields
(FID/OGR_GEOMETRY/OGR_GEOM_WKT/OGR_GEOM_AREA/OGR_STYLE) map to engine
expressions, OGR CAST target types map to Spark types, and constructs
OUTSIDE the dialect (GROUP BY, HAVING, sub-selects, RIGHT/FULL joins)
raise OGRSQLError with a message naming the offending construct — the
same rejection behavior as swq_parser.y.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_SPECIAL = {
    "fid": "fid",
    "ogr_geometry": "st_geometrytype(geometry)",
    "ogr_geom_wkt": "st_astext(geometry)",
    "ogr_geom_area": "st_area(geometry)",
    "ogr_style": "cast(null as string)",
}

_CAST_TYPES = {
    "character": "varchar",
    "string": "string",
    "varchar": "varchar",
    "integer": "int",
    "int": "int",
    "bigint": "bigint",
    "smallint": "smallint",
    "float": "double",
    "numeric": "decimal",
    "real": "double",
    "double": "double",
    "boolean": "boolean",
    "date": "date",
    "time": "string",
    "timestamp": "timestamp",
    "geometry": "binary",
}

_AGGREGATES = {"avg", "min", "max", "count", "sum", "stddev_pop", "stddev_samp"}


class OGRSQLError(ValueError):
    pass


@dataclass
class Tok:
    kind: str  # NUM STR IDENT OP PUNCT
    text: str


_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<str>'(?:[^']|'')*')"
    r"|(?P<num>\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)"
    r"|(?P<qid>\"[^\"]*\")"
    r"|(?P<ident>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op><=|>=|<>|!=|\|\||[=<>+\-*/%])"
    r"|(?P<punct>[(),.*])"
    r")"
)


def _lex(sql: str) -> list[Tok]:
    out: list[Tok] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m or m.end() == pos:
            rest = sql[pos:].strip()
            if not rest:
                break
            raise OGRSQLError(f"OGR SQL: unexpected character at {rest[:20]!r}")
        pos = m.end()
        for kind in ("str", "num", "qid", "ident", "op", "punct"):
            t = m.group(kind)
            if t is not None:
                out.append(Tok(kind.upper(), t))
                break
    return out


class _Parser:
    def __init__(
        self, toks: list[Tok], ogr_like: bool = True, style_col: bool = False
    ):
        # style_col: OGR_STYLE resolves to a real per-feature column
        # (ogr/ogr_featurestyle.h) instead of the typed NULL
        self.toks = toks
        self.style_col = style_col
        self.i = 0
        self.ogr_like = ogr_like

    # --- token helpers ---
    def peek(self, offset: int = 0) -> Tok | None:
        j = self.i + offset
        return self.toks[j] if j < len(self.toks) else None

    def kw(self, *words: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "IDENT" and t.text.lower() in words

    def eat_kw(self, *words: str) -> str | None:
        if self.kw(*words):
            t = self.toks[self.i]
            self.i += 1
            return t.text.lower()
        return None

    def expect_kw(self, word: str) -> None:
        if not self.eat_kw(word):
            got = self.peek().text if self.peek() else "<end>"
            raise OGRSQLError(f"OGR SQL: expected {word.upper()}, got {got!r}")

    def eat(self, text: str) -> bool:
        t = self.peek()
        if t is not None and t.text == text:
            self.i += 1
            return True
        return False

    def expect(self, text: str) -> None:
        if not self.eat(text):
            got = self.peek().text if self.peek() else "<end>"
            raise OGRSQLError(f"OGR SQL: expected {text!r}, got {got!r}")

    # --- statement ---
    def statement(self) -> str:
        parts = [self.select()]
        while self.kw("union"):
            self.i += 1
            self.expect_kw("all")
            parts.append(self.select())
        if self.peek() is not None:
            raise OGRSQLError(
                f"OGR SQL: trailing tokens at {self.peek().text!r}"
            )
        return " union all ".join(parts)

    def select(self) -> str:
        self.expect_kw("select")
        distinct = self.eat_kw("distinct") is not None
        cols = self.select_list()
        self.expect_kw("from")
        table, talias = self.table_ref()
        joins = []
        while self.kw("left", "join", "inner", "right", "full", "cross"):
            jk = self.eat_kw("left", "inner", "right", "full", "cross")
            if jk in ("right", "full", "cross"):
                raise OGRSQLError(
                    f"OGR SQL: {jk.upper()} JOIN is outside the dialect "
                    "(only [LEFT] JOIN ... ON, swq_parser.y)"
                )
            self.expect_kw("join")
            jt, ja = self.table_ref()
            self.expect_kw("on")
            cond = self.expr()
            joins.append((jk or "inner", jt, ja, cond))
        where = None
        if self.eat_kw("where"):
            where = self.expr()
        if self.kw("group", "having"):
            raise OGRSQLError(
                "OGR SQL: GROUP BY/HAVING are outside the dialect "
                "(aggregates are whole-table only, ogr/swq.cpp)"
            )
        order = []
        if self.eat_kw("order"):
            self.expect_kw("by")
            while True:
                e = self.expr()
                d = self.eat_kw("asc", "desc") or "asc"
                order.append(f"{e} {d}")
                if not self.eat(","):
                    break
        limit = offset = None
        if self.eat_kw("limit"):
            limit = self.toks[self.i].text
            self.i += 1
        if self.eat_kw("offset"):
            offset = self.toks[self.i].text
            self.i += 1
        out = "select "
        if distinct:
            out += "distinct "
        out += cols + " from " + table + (f" {talias}" if talias else "")
        for jk, jt, ja, cond in joins:
            kwd = "left join" if jk == "left" else "join"
            out += f" {kwd} {jt}" + (f" {ja}" if ja else "") + f" on {cond}"
        if where:
            out += f" where {where}"
        if order:
            out += " order by " + ", ".join(order)
        if limit is not None:
            out += f" limit {limit}"
        if offset is not None:
            out += f" offset {offset}"
        return out

    def table_ref(self) -> tuple[str, str | None]:
        t = self.peek()
        if t is None or t.kind not in ("IDENT", "QID"):
            if t is not None and t.text == "(":
                raise OGRSQLError(
                    "OGR SQL: sub-selects in FROM are outside the dialect"
                )
            raise OGRSQLError("OGR SQL: expected table name")
        self.i += 1
        name = t.text
        alias = None
        nxt = self.peek()
        if nxt is not None and nxt.kind == "IDENT" and nxt.text.lower() not in (
            "left", "join", "inner", "where", "order", "limit", "offset",
            "union", "on", "group", "having", "right", "full", "cross",
        ):
            alias = nxt.text
            self.i += 1
        return name, alias

    def select_list(self) -> str:
        if self.eat("*"):
            if self.kw("except", "exclude"):
                self.i += 1
                self.expect("(")
                cols = []
                while True:
                    cols.append(self.toks[self.i].text)
                    self.i += 1
                    if not self.eat(","):
                        break
                self.expect(")")
                return "* except (" + ", ".join(cols) + ")"
            return "*"
        items = []
        while True:
            e = self.expr()
            alias = None
            if self.eat_kw("as"):
                alias = self.toks[self.i].text
                self.i += 1
            elif (
                self.peek() is not None
                and self.peek().kind in ("IDENT", "QID")
                and not self.kw(
                    "from", "where", "order", "limit", "union", "left",
                    "join", "inner", "on", "offset", "group", "having",
                )
            ):
                alias = self.toks[self.i].text
                self.i += 1
            items.append(e + (f" as {alias}" if alias else ""))
            if not self.eat(","):
                break
        return ", ".join(items)

    # --- expressions ---
    def expr(self) -> str:
        parts = [self.and_expr()]
        while self.eat_kw("or"):
            parts.append(self.and_expr())
        return " or ".join(parts)

    def and_expr(self) -> str:
        parts = [self.not_expr()]
        while self.eat_kw("and"):
            parts.append(self.not_expr())
        return " and ".join(parts)

    def not_expr(self) -> str:
        if self.eat_kw("not"):
            return "not " + self.not_expr()
        return self.predicate()

    def predicate(self) -> str:
        left = self.addsub()
        neg = self.eat_kw("not") is not None
        if self.kw("like", "ilike"):
            self.i += 1
            pat = self.addsub()
            esc = ""
            if self.eat_kw("escape"):
                esc = " escape " + self.addsub()
            op = "ilike" if self.ogr_like else "like"
            core = f"{left} {op} {pat}{esc}"
            return f"not ({core})" if neg else core
        if self.eat_kw("in"):
            self.expect("(")
            vals = [self.addsub()]
            while self.eat(","):
                vals.append(self.addsub())
            self.expect(")")
            core = f"{left} in ({', '.join(vals)})"
            return f"not ({core})" if neg else core
        if self.eat_kw("between"):
            lo = self.addsub()
            self.expect_kw("and")
            hi = self.addsub()
            core = f"{left} between {lo} and {hi}"
            return f"not ({core})" if neg else core
        if neg:
            raise OGRSQLError("OGR SQL: NOT must precede LIKE/IN/BETWEEN")
        if self.eat_kw("is"):
            n = self.eat_kw("not") is not None
            self.expect_kw("null")
            return f"{left} is {'not ' if n else ''}null"
        t = self.peek()
        if t is not None and t.kind == "OP" and t.text in (
            "=", "<>", "!=", "<", ">", "<=", ">=",
        ):
            self.i += 1
            right = self.addsub()
            op = "<>" if t.text == "!=" else t.text
            return f"{left} {op} {right}"
        return left

    def addsub(self) -> str:
        out = self.muldiv()
        while True:
            t = self.peek()
            if t is not None and t.kind == "OP" and t.text in ("+", "-", "||"):
                self.i += 1
                out = f"{out} {t.text} {self.muldiv()}"
            else:
                return out

    def muldiv(self) -> str:
        out = self.unary()
        while True:
            t = self.peek()
            if t is not None and t.kind == "OP" and t.text in ("*", "/", "%"):
                self.i += 1
                out = f"{out} {t.text} {self.unary()}"
            else:
                return out

    def unary(self) -> str:
        t = self.peek()
        if t is not None and t.kind == "OP" and t.text == "-":
            self.i += 1
            return "-" + self.unary()
        return self.primary()

    def primary(self) -> str:
        t = self.peek()
        if t is None:
            raise OGRSQLError("OGR SQL: unexpected end of expression")
        if t.kind in ("STR", "NUM"):
            self.i += 1
            return t.text
        if t.text == "(":
            self.i += 1
            if self.kw("select"):
                raise OGRSQLError(
                    "OGR SQL: sub-selects are outside the dialect"
                )
            e = self.expr()
            self.expect(")")
            return f"({e})"
        if self.kw("cast"):
            self.i += 1
            self.expect("(")
            e = self.expr()
            self.expect_kw("as")
            ty = self.toks[self.i].text.lower()
            self.i += 1
            if ty not in _CAST_TYPES:
                raise OGRSQLError(f"OGR SQL: unknown CAST type {ty!r}")
            spark_ty = _CAST_TYPES[ty]
            if self.eat("("):
                args = [self.toks[self.i].text]
                self.i += 1
                while self.eat(","):
                    args.append(self.toks[self.i].text)
                    self.i += 1
                self.expect(")")
                spark_ty += "(" + ", ".join(args) + ")"
            self.expect(")")
            return f"cast({e} as {spark_ty})"
        if self.kw("null"):
            self.i += 1
            return "null"
        if t.kind in ("IDENT", "QID"):
            # function call?
            nxt = self.peek(1)
            if nxt is not None and nxt.text == "(" and t.kind == "IDENT":
                fname = t.text.lower()
                self.i += 2
                if self.eat("*"):
                    self.expect(")")
                    if fname != "count":
                        raise OGRSQLError(
                            f"OGR SQL: '*' argument only valid in COUNT"
                        )
                    return "count(*)"
                distinct = self.eat_kw("distinct") is not None
                args = []
                if not self.eat(")"):
                    args.append(self.expr())
                    while self.eat(","):
                        args.append(self.expr())
                    self.expect(")")
                if distinct and fname not in _AGGREGATES:
                    raise OGRSQLError(
                        "OGR SQL: DISTINCT only valid in aggregates"
                    )
                body = ("distinct " if distinct else "") + ", ".join(args)
                return f"{fname}({body})"
            # qualified / special identifier
            self.i += 1
            name = t.text
            if self.eat("."):
                col = self.toks[self.i].text
                self.i += 1
                low = col.lower()
                if low in _SPECIAL:
                    if low == "ogr_style" and self.style_col:
                        return f"{name}.ogr_style"
                    return _SPECIAL[low].replace(
                        "geometry", f"{name}.geometry"
                    ) if low != "fid" else f"{name}.fid"
                return f"{name}.{col}"
            low = name.lower()
            if low in _SPECIAL:
                if low == "ogr_style" and self.style_col:
                    return "ogr_style"
                return _SPECIAL[low]
            return name
        raise OGRSQLError(f"OGR SQL: unexpected token {t.text!r}")


def parse_ogr_sql(sql: str, ogr_like: bool = True, style_col: bool = False) -> str:
    """Parse an OGR-SQL-dialect statement and emit equivalent Spark SQL;
    raises OGRSQLError on constructs outside the dialect."""
    return _Parser(
        _lex(sql), ogr_like=ogr_like, style_col=style_col
    ).statement()
