"""Grok pattern mini-compiler: the `%{NAME:field}` log-parsing DSL
(Logstash's grok, the lingua franca of log pipelines) compiled to one
plain regex + a field list, so extraction is N `regexp_extract` columns
in a single codegen pass — no UDF, no per-row Python, and the identical
regex runs in the DuckDB oracle.

The pattern bank is the standard core subset (re-expressed from the
public grok pattern semantics, not copied): enough to parse access-log /
telemetry lines. Aliases compose (`%{INT}` inside `%{TIMESTAMP}`-style
nesting is supported through recursive expansion), and unnamed uses
(`%{IP}` without `:field`) match without capturing.

Engine portability: the emitted regex stays inside the Java-regex ∩ RE2
common subset — no backreferences, no lookaround — so Spark executors
and the DuckDB oracle compile the same pattern to the same language.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Core pattern bank (grok-compatible names; regexes written for the
# Java ∩ RE2 subset).
GROK_BANK: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "QUOTEDSTRING": r"\"[^\"]*\"",
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?"
        r"(?:Z|[+-]\d{2}:?\d{2})?"
    ),
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "PATH": r"(?:/[\w.-]*)+",
    # access-log vocabulary (the canonical grok use case), same
    # Java ∩ RE2 subset; HTTPDATE is the %d/%b/%Y:%H:%M:%S %z shape
    "HOSTNAME": r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)*",
    "PORT": r"\d{1,5}",
    "HTTPDATE": r"\d{2}/[A-Za-z]{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)",
    "URIPATHPARAM": r"/[^\s\"]*",
    "HTTPVERSION": r"HTTP/\d(?:\.\d)?",
    # composite: the Common Log Format line as one alias — named captures
    # come from the nested refs, so %{COMMONAPACHELOG} alone yields
    # clientip/ident/auth/timestamp/verb/request/httpversion/response/bytes
    "COMMONAPACHELOG": (
        r'%{IP:clientip} %{NOTSPACE:ident} %{NOTSPACE:auth} '
        r'\[%{HTTPDATE:timestamp}\] '
        r'"%{HTTPMETHOD:verb} %{URIPATHPARAM:request} %{HTTPVERSION:httpversion}" '
        r'%{INT:response:int} %{INT:bytes:int}'
    ),
}

_REF = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")
_MAX_DEPTH = 8  # alias nesting bound — the bank is acyclic by construction

# Logstash grok `:type` coercion suffixes → (Spark cast type, DuckDB cast
# type). int/float are the Logstash core pair; long/double/bool accepted as
# the ECS-style aliases. Both engines cast post-extraction, so a non-match
# ('' capture) and a malformed capture both land as NULL: Spark's non-ANSI
# cast and DuckDB's TRY_CAST share that contract.
GROK_TYPES: dict[str, tuple[str, str]] = {
    "int": ("long", "BIGINT"),
    "long": ("long", "BIGINT"),
    "float": ("double", "DOUBLE"),
    "double": ("double", "DOUBLE"),
    "bool": ("boolean", "BOOLEAN"),
}


def compile_grok_typed(
    pattern: str, bank: dict[str, str] | None = None
) -> tuple[str, list[tuple[str, str | None]]]:
    """Compile a grok expression to (regex, [(field, type_suffix|None)]).
    `%{NAME:f}` becomes a capturing group; `%{NAME:f:int}` additionally
    records the Logstash-style coercion suffix; `%{NAME}` matches without
    capturing; literal text is regex-escaped. Field order = capture-group
    order (group i+1 extracts fields[i])."""
    bank = dict(GROK_BANK, **(bank or {}))
    fields: list[tuple[str, str | None]] = []

    def expand(p: str, depth: int, literal: bool) -> str:
        # literal=True: the user's pattern — non-ref text is escaped.
        # literal=False: a bank entry — already a regex, pass through.
        if depth > _MAX_DEPTH:
            raise ValueError("grok alias nesting too deep (cycle?)")
        esc = re.escape if literal else (lambda s: s)
        out: list[str] = []
        last = 0
        for m in _REF.finditer(p):
            out.append(esc(p[last : m.start()]))
            name, field, typ = m.group(1), m.group(2), m.group(3)
            if name not in bank:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            if typ is not None and typ not in GROK_TYPES:
                raise KeyError(f"unknown grok type suffix :{typ}")
            if field:
                # the OUTER group opens before any nested named capture, so
                # its field must be appended before the recursive expansion
                # — fields[i] must stay aligned with capture group i+1
                fields.append((field, typ))
                inner = expand(bank[name], depth + 1, literal=False)
                out.append(f"({inner})")
            else:
                inner = expand(bank[name], depth + 1, literal=False)
                out.append(f"(?:{inner})")
            last = m.end()
        out.append(esc(p[last:]))
        return "".join(out)

    return expand(pattern, 0, literal=True), fields


def compile_grok(
    pattern: str, bank: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """Untyped view of compile_grok_typed: (regex, field names) — the
    original API, kept for callers that handle coercion themselves."""
    regex, typed = compile_grok_typed(pattern, bank)
    return regex, [f for f, _ in typed]


def grok_extract_multi(
    df: DataFrame,
    patterns: list[str],
    text_col: str = "text",
    keep: bool = False,
    bank: dict[str, str] | None = None,
) -> DataFrame:
    """Logstash `match` ARRAY semantics: try grok patterns in order, the
    first whose regex matches the line wins. Emits the union of all
    patterns' fields — a field gets the winning pattern's capture (typed
    per that pattern's `:type` suffix), or NULL when the winner doesn't
    define it — plus `grok_pattern_idx` (0-based winner, NULL on no
    match: the dead-letter routing key). Still one codegen pass: N rlike
    predicates fold into one CASE per field; no UDF.

    A field named by several patterns must carry the same type suffix in
    each (the analyzer can't give one column two types); that conflict
    raises at compile time, not as a runtime cast surprise."""
    compiled = [compile_grok_typed(p, bank) for p in patterns]
    # field -> type consistency across patterns
    ftype: dict[str, str | None] = {}
    order: list[str] = []
    for _, fl in compiled:
        for f, t in fl:
            if f in ftype and ftype[f] != t:
                raise ValueError(
                    f"field {f!r} has conflicting type suffixes across patterns"
                )
            if f not in ftype:
                ftype[f] = t
                order.append(f)
    idx = F.lit(None).cast("int")
    for i in range(len(compiled) - 1, -1, -1):
        idx = F.when(
            F.col(text_col).rlike(compiled[i][0]), F.lit(i)
        ).otherwise(idx)
    cols: list[Column] = []
    for f in order:
        expr = F.lit(None).cast("string")
        for i in range(len(compiled) - 1, -1, -1):
            rx, fl = compiled[i]
            names = [n for n, _ in fl]
            if f in names:
                expr = F.when(
                    idx == i, F.regexp_extract(F.col(text_col), rx, names.index(f) + 1)
                ).otherwise(expr)
        if ftype[f] is not None:
            expr = expr.cast(GROK_TYPES[ftype[f]][0])
        cols.append(expr.alias(f))
    cols.append(idx.alias("grok_pattern_idx"))
    if keep:
        return df.select("*", *cols)
    return df.select(*cols)


def grok_extract(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    keep: bool = False,
    bank: dict[str, str] | None = None,
    with_matched: bool = False,
) -> DataFrame:
    """Apply a grok pattern as one codegen pass: each captured field
    becomes a string column (empty string when the line doesn't match —
    regexp_extract's convention, identical in DuckDB), and a `:type`
    suffix casts the capture (Logstash coercion; non-ANSI cast, so
    non-match/malformed → NULL — DuckDB's TRY_CAST twin). `with_matched`
    adds a `grok_matched` boolean (the same unanchored predicate
    regexp_extract evaluates), the dead-letter routing key a pipeline
    filters on instead of guessing from all-empty fields. `keep` retains
    the original columns alongside the extracted fields; `bank` supplies
    custom pattern aliases on top of GROK_BANK."""
    regex, fields = compile_grok_typed(pattern, bank)
    cols: list[Column] = []
    for i, (f, typ) in enumerate(fields):
        c = F.regexp_extract(F.col(text_col), regex, i + 1)
        if typ is not None:
            c = c.cast(GROK_TYPES[typ][0])
        cols.append(c.alias(f))
    if with_matched:
        cols.append(F.col(text_col).rlike(regex).alias("grok_matched"))
    if keep:
        return df.select("*", *cols)
    return df.select(*cols)
