"""Native-Column text functions — the (N) mappings from SURVEY.md §2.

Everything here stays JVM-side (whole-stage codegen): regexp_replace chains,
higher-order array functions, try_to_timestamp coalesce. These are used both
inside the transcript pipeline (post-UDF stages) and by the driver-contract
queries over the testdata `documents` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from blogparser_spark.functions import patterns as P

# --------------------------------------------------------------- generic ---


def collapse_ws(col: Column) -> Column:
    """strings.Fields-join analog (parser/title.go:76-87): collapse any
    whitespace run to one space, trim."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def normalize_lines(col: Column) -> Column:
    """normalizeHTML (parser/content.go:116-136): CRLF→LF, trim lines, drop
    empties, join with \\n, trim — as one native chain."""
    c = F.regexp_replace(col, r"\r\n?", "\n")
    c = F.regexp_replace(c, r"(?m)^[ \t\f\v]+|[ \t\f\v]+$", "")  # trim each line
    c = F.regexp_replace(c, r"\n{2,}", "\n")  # drop empty lines
    return F.trim(c)


def strip_tags(col: Column) -> Column:
    """doc.Text() analog: markup → space, entities decoded (the DOM parser
    the reference re-parses through decodes text nodes — BASIC_ENTITIES is
    the Column-expressible chain, shared verbatim with the oracle), collapse
    (summary.go:102-106)."""
    c = F.regexp_replace(col, r"<[^>]+>", " ")
    for ent, ch in P.BASIC_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return collapse_ws(c)


# ----------------------------------------------------------------- title ---


def clean_title(col: Column) -> Column:
    """parser/title.go:76-87 as a native chain: \\n→space, collapse ws,
    escape double quotes, strip the literal site-name suffix, trim."""
    c = F.regexp_replace(col, r"\n", " ")
    c = collapse_ws(c)
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.replace(c, F.lit(P.SITE_NAME_SUFFIX), F.lit(""))
    return F.trim(c)


def is_valid_title(col: Column) -> Column:
    """parser/title.go:90-109: non-empty ∧ no <> ∧ no control chars
    (\\t\\n\\r allowed)."""
    return (
        (col.isNotNull())
        & (col != "")
        & ~col.rlike("[<>]")
        & ~col.rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]")
    )


def is_valid_content(col: Column) -> Column:
    """parser/content.go:139-151 — **byte** semantics via octet_length."""
    return col.isNotNull() & (F.octet_length(col) >= P.MIN_CONTENT_BYTES)


# --------------------------------------------------------------- summary ---


def truncate_summary(col: Column) -> Column:
    """parser/summary.go:164-171 — Spark length/substring are char-based,
    matching Go rune slicing."""
    return F.when(
        F.length(col) > P.SUMMARY_MAX_RUNES,
        F.concat(F.substring(col, 1, P.SUMMARY_MAX_RUNES), F.lit(P.SUMMARY_ELLIPSIS)),
    ).otherwise(col)


def summarize_truncation(body_col: Column) -> Column:
    """strip tags → collapse ws → truncate (A1 fast path + A2)."""
    return truncate_summary(strip_tags(body_col))


def split_sentences(col: Column, delim: str = P.SENTENCE_DELIM) -> Column:
    """splitSentences (summary.go:244-254): split on 。 (or a caller-supplied
    delimiter regex), trim, drop empties."""
    return F.filter(
        F.transform(F.split(col, delim), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def is_sentence_end(surface: Column, pos: Column | None = None) -> Column:
    """A10 isSentenceEnd (summary.go:257-271) as a Column predicate:
    sentence-final punctuation, or POS 記号-句点 / 記号-終助詞 (the jpos
    label form of the reference's features[0]+'-'+features[1])."""
    punct = surface.isin("。", "！", "？", ".", "!", "?")
    if pos is None:
        return punct
    return punct | pos.isin("記号-句点", "記号-終助詞")


# ------------------------------------------------------------------ slug ---


def slugify(col: Column) -> Column:
    """pkg/models/blog.go:26-50."""
    c = F.regexp_replace(F.lower(col), "[^a-z0-9 ]", "")
    c = F.regexp_replace(c, "[^a-z0-9]+", "-")
    return F.regexp_replace(c, "^-+|-+$", "")


# ------------------------------------------------------------------ date ---


def try_parse_date(col: Column) -> Column:
    """parseDateString (parser/date.go:113-137): try layouts in order via
    try_to_timestamp coalesce; Japanese dates pre-normalized
    (\\d+)年(\\d+)月(\\d+)日 → y-M-d. Malformed → NULL (zero-time analog)."""
    jp = F.regexp_replace(F.trim(col), r"(\d{4})年(\d{1,2})月(\d{1,2})日", r"$1-$2-$3")
    cands = [F.try_to_timestamp(F.trim(col), F.lit(f)) for f in P.SPARK_DATE_FORMATS]
    cands += [
        F.try_to_timestamp(jp, F.lit("yyyy-M-d H:mm")),
        F.try_to_timestamp(jp, F.lit("yyyy-M-d")),
    ]
    return F.coalesce(*cands)


def pick_date(candidates: Column) -> Column:
    """Given array<string> date candidates already in priority order, return
    the first parseable one (unparseable candidates fall through — mirrors
    the per-candidate validation in parser/date.go:20-90)."""
    parsed = F.transform(candidates, lambda s: try_parse_date(s))
    # try_element_at: no parseable candidate → NULL, not an ANSI
    # INVALID_ARRAY_INDEX on the empty filtered array
    return F.try_element_at(F.filter(parsed, lambda t: t.isNotNull()), F.lit(1))


# ------------------------------------------------------------------ tags ---


def clean_tag(col: Column) -> Column:
    """parser/tag.go:113-134 as a native chain (used via transform()):
    deletes the BARE site name (tag.go:118) and strips exactly ONE leading
    '#' (TrimPrefix, tag.go:127)."""
    c = F.trim(col)
    c = F.replace(c, F.lit(P.SITE_NAME), F.lit(""))
    c = F.replace(c, F.lit("ブログ"), F.lit(""))
    c = F.regexp_replace(c, r"\n", " ")
    c = F.regexp_replace(c, "^#", "")
    return collapse_ws(c)


def clean_category(col: Column) -> Column:
    """parser/category.go:114-141 as a native chain."""
    c = collapse_ws(F.regexp_replace(col, r"\n", " "))
    pref = "|".join(P.CATEGORY_PREFIXES)
    return F.trim(F.regexp_replace(c, f"^({pref})", ""))


def finalize_string_array(col: Column, cleaner) -> Column:
    """clean each element, drop empties, order-preserving dedup
    (array_distinct keeps first occurrence — parser/category.go:166-168)."""
    return F.array_distinct(
        F.filter(F.transform(col, cleaner), lambda s: s != "")
    )
