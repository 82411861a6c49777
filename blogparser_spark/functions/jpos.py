"""Heuristic Japanese POS tagging — the kagome-free stand-in for the
reference's morphological tokenizer (parser/summary.go:186-223).

The reference runs kagome with the IPA dictionary and keeps, per token,
pos = features[0] + "-" + features[1]; tokens whose getWordWeight(pos)
(summary.go:227-241) is 0 — particles, auxiliaries, symbols — are dropped
from the sentence vectors. The sandbox has no morphological dictionary, so
this module substitutes a deterministic script-run segmenter + a
dictionary/suffix POS heuristic that emits the SAME POS label vocabulary
(名詞-一般, 動詞-自立, …) so the posWeights broadcast dimension
(operators/enrich.dim_pos_weight) joins on real keys.

DOCUMENTED DEVIATIONS from kagome (SURVEY.md §7.4-5): segmentation is by
script-class runs, not lattice search; lemma = surface (no de-inflection);
POS is heuristic. The *shape* of the computation — tokenize → POS →
weight-lookup-with-prefix-fallback → drop weight-0 tokens — matches
summary.go exactly.

Every rule exists twice: as a Spark Column expression and as generated
ANSI SQL (for the DuckDB oracle), built from the same constants so the two
engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from blogparser_spark.functions.patterns import POS_PREFIX_WEIGHTS, POS_WEIGHTS

# script-class run segmentation: kanji | hiragana | katakana(+ー) | latin | digits
SEGMENT_RE = r"[一-龯々]+|[ぁ-ゖ]+|[ァ-ヶー]+|[A-Za-z]+|[0-9]+"

# closed-class function words (public Japanese grammar): exact-match stages
# of the heuristic, both mapping to weight-0 POS (dropped, like kagome 助詞)
PARTICLES = ("は", "が", "を", "に", "で", "と", "も", "の", "へ", "から", "まで", "より", "や", "か")
AUXILIARIES = ("です", "ます", "でした", "ました", "だ", "である", "ない", "た", "て", "ている")

VERB_SUFFIXES = "るうくすつむぶぬぐ"  # godan/ichidan dictionary-form endings


def segment(col: Column) -> Column:
    """text → array of script-run tokens (the tokenizer's segmentation)."""
    return F.regexp_extract_all(col, F.lit(SEGMENT_RE), 0)


def pos_of(term: Column) -> Column:
    """Heuristic POS label for one segmented token — the rule order is the
    spec; pos_case_sql() generates the identical CASE for DuckDB."""
    return (
        F.when(
            term.rlike("^[ァ-ヶー]+$"),
            F.when(F.length(term) >= 4, "名詞-固有名詞").otherwise("名詞-一般"),
        )
        .when(term.rlike("^[一-龯々]+$"), "名詞-一般")
        .when(term.rlike("^[A-Z]"), "名詞-固有名詞")
        .when(term.rlike("^[a-z]"), "名詞-一般")
        .when(term.rlike("^[0-9]+$"), "名詞-数")
        .when(term.isin(*PARTICLES), "助詞-格助詞")
        .when(term.isin(*AUXILIARIES), "助動詞")
        .when(term.rlike("い$"), "形容詞-自立")
        .when(term.rlike(f"[{VERB_SUFFIXES}]$"), "動詞-自立")
        .otherwise("助詞-係助詞")
    )


def default_weight(pos: Column) -> Column:
    """getWordWeight's prefix fallback (summary.go:232-241): 名詞→1.0,
    動詞→0.9, 形容詞→0.9, else 0 (token dropped). The exact posWeights map
    is NOT applied here — it enters as the broadcast dim join
    (enrich.dim_pos_weight), with this as the coalesce fallback."""
    w = F.lit(0.0)
    for prefix, weight in POS_PREFIX_WEIGHTS.items():
        w = F.when(pos.startswith(prefix), F.lit(weight)).otherwise(w)
    return w


# ----------------------------------------------------------- SQL twins ----


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def pos_case_sql(term: str) -> str:
    """The pos_of() rules as a DuckDB CASE expression over column `term`."""
    particles = ", ".join(_sql_quote(p) for p in PARTICLES)
    aux = ", ".join(_sql_quote(a) for a in AUXILIARIES)
    return f"""CASE
      WHEN regexp_matches({term}, '^[ァ-ヶー]+$')
        THEN CASE WHEN length({term}) >= 4 THEN '名詞-固有名詞' ELSE '名詞-一般' END
      WHEN regexp_matches({term}, '^[一-龯々]+$') THEN '名詞-一般'
      WHEN regexp_matches({term}, '^[A-Z]') THEN '名詞-固有名詞'
      WHEN regexp_matches({term}, '^[a-z]') THEN '名詞-一般'
      WHEN regexp_matches({term}, '^[0-9]+$') THEN '名詞-数'
      WHEN {term} IN ({particles}) THEN '助詞-格助詞'
      WHEN {term} IN ({aux}) THEN '助動詞'
      WHEN regexp_matches({term}, 'い$') THEN '形容詞-自立'
      WHEN regexp_matches({term}, '[{VERB_SUFFIXES}]$') THEN '動詞-自立'
      ELSE '助詞-係助詞'
    END"""


def weight_case_sql(pos: str) -> str:
    """getWordWeight (summary.go:227-241) as SQL: exact posWeights map, then
    prefix defaults, else 0."""
    exact = " ".join(
        f"WHEN {pos} = {_sql_quote(k)} THEN {v}" for k, v in POS_WEIGHTS.items()
    )
    prefix = " ".join(
        f"WHEN {pos} LIKE {_sql_quote(k + '%')} THEN {v}"
        for k, v in POS_PREFIX_WEIGHTS.items()
    )
    return f"CASE {exact} {prefix} ELSE 0.0 END"


# ------------------------------------------------------ python oracle ----


def tokenize_pos_py(text: str) -> list[tuple[str, str, float]]:
    """Pure-Python twin of segment+pos_of+weights for pytest oracles:
    (surface, pos, weight) per kept token, weight-0 tokens dropped
    (summary.go:208-216)."""
    import re

    out: list[tuple[str, str, float]] = []
    for tok in re.findall(SEGMENT_RE, text):
        if re.fullmatch(r"[ァ-ヶー]+", tok):
            pos = "名詞-固有名詞" if len(tok) >= 4 else "名詞-一般"
        elif re.fullmatch(r"[一-龯々]+", tok):
            pos = "名詞-一般"
        elif re.match(r"[A-Z]", tok):
            pos = "名詞-固有名詞"
        elif re.match(r"[a-z]", tok):
            pos = "名詞-一般"
        elif re.fullmatch(r"[0-9]+", tok):
            pos = "名詞-数"
        elif tok in PARTICLES:
            pos = "助詞-格助詞"
        elif tok in AUXILIARIES:
            pos = "助動詞"
        elif tok.endswith("い"):
            pos = "形容詞-自立"
        elif tok[-1] in VERB_SUFFIXES:
            pos = "動詞-自立"
        else:
            pos = "助詞-係助詞"
        if pos in POS_WEIGHTS:
            w = POS_WEIGHTS[pos]
        else:
            w = 0.0
            for prefix, weight in POS_PREFIX_WEIGHTS.items():
                if pos.startswith(prefix):
                    w = weight
                    break
        if w > 0:
            out.append((tok, pos, w))
    return out
