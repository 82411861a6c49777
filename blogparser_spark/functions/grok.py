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
}

_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")
_MAX_DEPTH = 8  # alias nesting bound — the bank is acyclic by construction


def compile_grok(pattern: str, bank: dict[str, str] | None = None) -> tuple[str, list[str]]:
    """Compile a grok expression to (regex, captured_fields). `%{NAME:f}`
    becomes a capturing group; `%{NAME}` matches without capturing;
    literal text is regex-escaped. Field order = capture-group order
    (group i+1 extracts fields[i])."""
    bank = dict(GROK_BANK, **(bank or {}))
    fields: list[str] = []

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
            name, field = m.group(1), m.group(2)
            if name not in bank:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            if field:
                # the OUTER group opens before any nested named capture, so
                # its field must be appended before the recursive expansion
                # — fields[i] must stay aligned with capture group i+1
                fields.append(field)
                inner = expand(bank[name], depth + 1, literal=False)
                out.append(f"({inner})")
            else:
                inner = expand(bank[name], depth + 1, literal=False)
                out.append(f"(?:{inner})")
            last = m.end()
        out.append(esc(p[last:]))
        return "".join(out)

    return expand(pattern, 0, literal=True), fields


def grok_extract(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    keep: bool = False,
    bank: dict[str, str] | None = None,
) -> DataFrame:
    """Apply a grok pattern as one codegen pass: each captured field
    becomes a string column (empty string when the line doesn't match —
    regexp_extract's convention, identical in DuckDB). `keep` retains the
    original columns alongside the extracted fields; `bank` supplies
    custom pattern aliases on top of GROK_BANK."""
    regex, fields = compile_grok(pattern, bank)
    cols: list[Column] = [
        F.regexp_extract(F.col(text_col), regex, i + 1).alias(f)
        for i, f in enumerate(fields)
    ]
    if keep:
        return df.select("*", *cols)
    return df.select(*cols)
