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
script-class runs (with a kanji-stem + inflection-suffix merge, below), not
lattice search; the lemma comes from a deterministic suffix de-inflection
rule table, not dictionary features[6]; POS is heuristic. The *shape* of
the computation — tokenize → POS → weight-lookup-with-prefix-fallback →
drop weight-0 tokens, with tf/df keyed on the LEMMA (summary.go:51-95
containsWord/calculateTF compare word.Lemma) — matches summary.go exactly.

Every rule exists THRICE: as a Spark Column expression, as generated ANSI
SQL (for the DuckDB oracle), and as the pure-Python pytest twin — all
built from the same constants so the engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from blogparser_spark.functions.patterns import POS_PREFIX_WEIGHTS, POS_WEIGHTS

# Suffix de-inflection (godan/ichidan/adjective endings → dictionary form),
# longest suffix first; the first matching rule with a NON-EMPTY stem wins.
# kagome derives the true lemma from the lattice (features[6]); this is the
# deterministic stand-in: 飛びます→飛ぶ, 嬉しかった→嬉しい, 走りました→走る.
# godan ます-stem vowel row → dictionary-form ending (書き→書く, 走り→走る)
_GODAN_STEM_END: tuple[tuple[str, str], ...] = (
    ("い", "う"),
    ("き", "く"),
    ("ぎ", "ぐ"),
    ("し", "す"),
    ("ち", "つ"),
    ("に", "ぬ"),
    ("び", "ぶ"),
    ("み", "む"),
    ("り", "る"),
)


def _build_lemma_rules() -> tuple[tuple[str, str], ...]:
    rules: list[tuple[str, str]] = [
        # し-adjective inflections (嬉しかった → 嬉しい)
        ("しかった", "しい"),
        ("しくない", "しい"),
        ("しくて", "しい"),
        # adjective + polite copula (おいしいです → おいしい,
        # 高かったです → 高い) — the fused run otherwise survives as a
        # phantom or is glue-gated away
        ("かったです", "い"),
        ("くないです", "い"),
        ("いです", "い"),
    ]
    # godan polite forms keep their stem row (走りました → 走る)
    for stem, dict_end in _GODAN_STEM_END:
        rules += [
            (stem + "ました", dict_end),
            (stem + "ません", dict_end),
            (stem + "ます", dict_end),
        ]
    rules += [
        # ichidan polite forms: stem + る (食べました → 食べる)
        ("ましょう", "る"),
        ("ました", "る"),
        ("ません", "る"),
        ("かった", "い"),
        ("くない", "い"),
        ("くて", "い"),
        ("ます", "る"),
        # た/て forms by euphonic change
        ("って", "る"),
        ("った", "る"),
        ("んで", "む"),
        ("んだ", "む"),
        ("いて", "く"),
        ("いた", "く"),
        ("いで", "ぐ"),
        ("いだ", "ぐ"),
        ("して", "す"),
        ("した", "す"),
    ]
    return tuple(rules)


LEMMA_RULES: tuple[tuple[str, str], ...] = _build_lemma_rules()

# Irregular verbs (サ変 する, カ変 来る/くる): their inflected forms don't
# follow the godan/ichidan suffix rows (します would suffix-rewrite to しる,
# きました to きる), so — like every dictionary — they are an exact-match
# table consulted BEFORE the suffix rules. Only BARE forms are listed;
# kanji-noun+する compounds (勉強しました vs the godan 話しました→話す)
# resolve through the bundled SURU_NOUNS lexicon below — stems OUTSIDE
# that list still take the godan rule and remain the documented
# lattice-morphology residual (per-token parity rate measured in
# tests/test_summary_bm25.py::test_morphology_parity_rate: 46/48 on the
# extended gold vs the pre-lexicon twin's 24/42 on the original corpus).
IRREGULAR_LEMMAS: dict[str, str] = {
    # する
    "します": "する", "しました": "する", "しません": "する",
    "しましょう": "する", "して": "する", "した": "する", "しない": "する",
    "すれば": "する", "しよう": "する",
    # くる (hiragana)
    "きます": "くる", "きました": "くる", "きません": "くる",
    "きて": "くる", "きた": "くる", "こない": "くる", "こよう": "くる",
    # 来る (kanji stem)
    "来ます": "来る", "来ました": "来る", "来ません": "来る",
    "来て": "来る", "来た": "来る", "来ない": "来る",
    # できる (kana potential verb — the suffix rows would give でく)
    "できます": "できる", "できました": "できる", "できません": "できる",
    "できて": "できる", "できた": "できる",
    "できない": "できる", "できなかった": "できる",
    # polite past negatives: longer than the glued-run gate, so they must
    # resolve by exact match before it (the suffix rows would mangle them)
    "できませんでした": "できる", "しませんでした": "する",
    "ありませんでした": "ある",
}

# Pure-hiragana tokens longer than this are PARTICLE-GLUED RESIDUE, not
# content words: the script-run segmenter cannot split interior particles
# out of an all-kana stretch (それはできない), and real kana content words
# — できる, わかる, うれしい, おいしい — fit within 5 chars. Gated tokens
# keep lemma = surface and take the weight-0 POS, so they never pollute
# tf/df vectors as phantom verbs/adjectives. Exact-match entries
# (IRREGULAR_LEMMAS, KANA_LEXICON) resolve BEFORE the gate.
_GLUED_KANA_LEN = 5
# tokens eligible for de-inflection: optional kanji stem + hiragana tail
_INFLECTABLE_RE = r"^[一-龯々]*[ぁ-ゖ]+$"

# High-frequency サ変 nouns (the round-5 ambiguity lexicon): <noun>+する
# compounds inflect like します/しました, which is lexically IDENTICAL to a
# godan す-verb ending (話しました → 話す) — undecidable without a
# dictionary, so this bundled exact-match noun list decides it: a merged
# token whose stem is here de-inflects to <noun>する, anything else keeps
# the godan rule. Chosen from public frequency lists, all two-kanji so no
# godan-す stem (話, 出, 押, …, all single-kanji or verb-specific
# compounds) collides.
SURU_NOUNS: tuple[str, ...] = (
    "勉強", "運動", "練習", "旅行", "掃除", "料理", "散歩", "説明",
    "連絡", "電話", "結婚", "質問", "研究", "紹介", "準備", "利用",
    "使用", "確認", "開発", "処理", "検索", "登録", "更新", "削除",
    "保存", "送信", "受信", "実行", "設定", "入力", "出力", "接続",
    "完了", "開始", "終了", "参加", "発表", "報告", "対応", "案内",
)
# the する-inflections the segmenter merges onto a kanji stem (⊆ the
# suffix alternation below); bare forms (しない, しましょう, すれば) split
# off as their own hiragana token and resolve via IRREGULAR_LEMMAS
_SURU_FORMS: tuple[str, ...] = ("しました", "しません", "します", "して", "した")

# Okurigana compound nouns (kanji + hiragana + kanji …) the script-run
# segmenter would otherwise split at every script boundary (晴れ → 晴 +
# れです, 問い合わせ → 問 + い + 合 + わせ): a small bundled LONGEST-MATCH
# lexicon, tried FIRST in the segmentation regex (leftmost-first
# alternation — identical semantics in Java regex, RE2/DuckDB, and Python
# re) and tagged 名詞-一般. High-frequency picks from public lists.
SEGMENT_LEXICON: tuple[str, ...] = tuple(
    sorted(
        (
            "問い合わせ", "打ち合わせ", "申し込み", "読み込み", "書き込み",
            "取り組み", "受け取り", "乗り換え", "切り替え", "引っ越し",
            "気持ち", "買い物", "飲み物", "食べ物", "晴れ", "曇り",
            "手続き", "締め切り", "売り上げ", "振り込み",
        ),
        key=len,
        reverse=True,
    )
)

# Kana words beginning with a split-particle character (below): listed
# before the particle branch so the split never dismembers them
# (できました would otherwise become で + きました → くる).
KANA_LEXICON: tuple[str, ...] = tuple(
    sorted(
        (
            "できました", "できません", "できなかった", "できない",
            "できます", "できて", "できた", "できる",
            # copulas/auxiliaries that START with a split-particle char:
            # です would otherwise split to で + す, injecting a phantom
            # weighted verb into every 〜です sentence
            "でしょう", "でした", "です", "では", "でも",
            "とても", "はじめて",
        ),
        key=len,
        reverse=True,
    )
)

# Single-char case particles split off the FRONT of a hiragana run (one
# char per match, leftmost-first — RE2 has no lookahead, so this is the
# portable form): をしました then tokenizes を + しました → する instead
# of the をす garbage token. Word-initial occurrences of these chars are
# protected by KANA_LEXICON above; everything else starting with them
# (もう, やはり…) was weight-0 noise before and after the split.
_SPLIT_PARTICLES = "はがをにでとへ"

# segmentation: a kanji stem MERGES with a directly-following inflection
# suffix (so 飛びます is ONE token and de-inflects to the true lemma 飛ぶ
# instead of splitting into 飛 + びます); the suffix alternation is built
# from the rule table + bare い (already-dictionary-form adjectives), so
# ordinary particles (分散処理の → 分散処理 + の) never merge. The
# okurigana + kana lexicons alternate FIRST (longest entries first), so
# their words survive as single tokens.
_SUFFIX_ALT = "|".join([s for s, _ in LEMMA_RULES] + ["しい", "い"])
SEGMENT_RE = (
    "|".join(SEGMENT_LEXICON + KANA_LEXICON)
    + r"|[一-龯々]+(?:" + _SUFFIX_ALT + r")?"
    + f"|[{_SPLIT_PARTICLES}]"
    + r"|[ぁ-ゖ]+|[ァ-ヶー]+|[A-Za-z]+|[0-9]+"
)

# closed-class function words (public Japanese grammar): exact-match stages
# of the heuristic, both mapping to weight-0 POS (dropped, like kagome 助詞)
PARTICLES = ("は", "が", "を", "に", "で", "と", "も", "の", "へ", "から", "まで", "より", "や", "か")
AUXILIARIES = (
    "です", "ます", "でした", "ました", "だ", "である", "ない", "た", "て",
    "ている", "でしょう", "だった", "ないです",
)

VERB_SUFFIXES = "るうくすつむぶぬぐ"  # godan/ichidan dictionary-form endings


def segment(col: Column) -> Column:
    """text → array of script-run tokens (the tokenizer's segmentation)."""
    return F.regexp_extract_all(col, F.lit(SEGMENT_RE), 0)


def _rules_by_len() -> list[tuple[int, dict[str, str]]]:
    by_len: dict[int, dict[str, str]] = {}
    for sfx, rep in LEMMA_RULES:
        by_len.setdefault(len(sfx), {})[sfx] = rep
    return sorted(by_len.items(), reverse=True)


def lemma_of(term: Column) -> Column:
    """Suffix de-inflection: the matching LEMMA_RULES entry with a
    non-empty stem rewrites the ending; closed-class auxiliaries and
    everything uninflected (katakana, latin, digits) keep lemma = surface.

    Longest-suffix-first with one literal-map lookup per suffix LENGTH —
    semantically identical to first-match-in-table-order (same-length
    suffixes are mutually exclusive as endswith conditions, and every
    nested pair in the table is ordered longer-first), but the Column tree
    is 3 map lookups instead of 48 when-branches: the 48-branch form's
    whole-stage codegen cost showed up as a 23 s cold first run."""
    inflectable = term.rlike(_INFLECTABLE_RE) & ~term.isin(*AUXILIARIES)
    cands = []
    for length, rules in _rules_by_len():
        m = F.create_map(
            *[F.lit(x) for sfx_rep in rules.items() for x in sfx_rep]
        )
        # try_element_at: NULL (not an ANSI error) when no rule has this
        # suffix — the library surface must work in ANSI-on sessions too
        rep = F.try_element_at(m, F.substring(term, -length, length))
        stem = F.substring(term, F.lit(1), F.length(term) - length)
        # concat(NULL) propagates: no rule at this length → try the next
        cands.append(
            F.when(F.length(term) > length, F.concat(stem, rep)).otherwise(
                F.lit(None).cast("string")
            )
        )
    irr = F.try_element_at(
        F.create_map(*[F.lit(x) for kv in IRREGULAR_LEMMAS.items() for x in kv]),
        term,
    )
    # サ変 compound: <SURU_NOUNS stem> + する-inflection → stem + する,
    # consulted BEFORE the godan suffix rules (which would give stem + す)
    suru = []
    for form in _SURU_FORMS:
        ln = len(form)
        stem = F.substring(term, F.lit(1), F.length(term) - ln)
        suru.append(
            F.when(
                (F.length(term) > ln)
                & (F.substring(term, -ln, ln) == form)
                & stem.isin(*SURU_NOUNS),
                F.concat(stem, F.lit("する")),
            ).otherwise(F.lit(None).cast("string"))
        )
    return F.coalesce(
        irr, *suru, F.when(inflectable, F.coalesce(*cands, term)).otherwise(term)
    )


def pos_of_lemma(term: Column, lemma: Column) -> Column:
    """POS for a (surface, lemma) pair: a de-inflected token is a verb or
    adjective by its dictionary-form ending; uninflected tokens go through
    the surface rules (pos_of). The glued-run gate applies to the LEMMA:
    a de-inflected pure-kana lemma longer than _GLUED_KANA_LEN came from
    a particle-glued run (それはたべました → それはたべる), while a real
    polite form's lemma fits (わかりました → わかる)."""
    glued = lemma.rlike("^[ぁ-ゖ]+$") & (F.length(lemma) > _GLUED_KANA_LEN)
    return F.when(
        lemma != term,
        F.when(glued, "助詞-係助詞")
        .when(lemma.endswith("い"), "形容詞-自立")
        .otherwise("動詞-自立"),
    ).otherwise(pos_of(term))


def pos_of(term: Column) -> Column:
    """Heuristic POS label for one segmented token — the rule order is the
    spec; pos_case_sql() generates the identical CASE for DuckDB."""
    return (
        F.when(term.isin(*SEGMENT_LEXICON), "名詞-一般")
        .when(
            term.rlike("^[ァ-ヶー]+$"),
            F.when(F.length(term) >= 4, "名詞-固有名詞").otherwise("名詞-一般"),
        )
        .when(term.rlike("^[一-龯々]+$"), "名詞-一般")
        .when(term.rlike("^[A-Z]"), "名詞-固有名詞")
        .when(term.rlike("^[a-z]"), "名詞-一般")
        .when(term.rlike("^[0-9]+$"), "名詞-数")
        .when(term.isin(*PARTICLES), "助詞-格助詞")
        .when(term.isin(*AUXILIARIES), "助動詞")
        .when(
            term.rlike("^[ぁ-ゖ]+$") & (F.length(term) > _GLUED_KANA_LEN),
            "助詞-係助詞",  # particle-glued residue: weight 0, dropped
        )
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
    lexicon = ", ".join(_sql_quote(w) for w in SEGMENT_LEXICON)
    return f"""CASE
      WHEN {term} IN ({lexicon}) THEN '名詞-一般'
      WHEN regexp_matches({term}, '^[ァ-ヶー]+$')
        THEN CASE WHEN length({term}) >= 4 THEN '名詞-固有名詞' ELSE '名詞-一般' END
      WHEN regexp_matches({term}, '^[一-龯々]+$') THEN '名詞-一般'
      WHEN regexp_matches({term}, '^[A-Z]') THEN '名詞-固有名詞'
      WHEN regexp_matches({term}, '^[a-z]') THEN '名詞-一般'
      WHEN regexp_matches({term}, '^[0-9]+$') THEN '名詞-数'
      WHEN {term} IN ({particles}) THEN '助詞-格助詞'
      WHEN {term} IN ({aux}) THEN '助動詞'
      WHEN regexp_matches({term}, '^[ぁ-ゖ]+$')
        AND length({term}) > {_GLUED_KANA_LEN} THEN '助詞-係助詞'
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


def lemma_case_sql(term: str) -> str:
    """lemma_of() as a DuckDB CASE over column `term` (char-based length /
    substr / LIKE are multibyte-correct in DuckDB)."""
    aux = ", ".join(_sql_quote(a) for a in AUXILIARIES)
    irr = " ".join(
        f"WHEN {term} = {_sql_quote(form)} THEN {_sql_quote(lem)}"
        for form, lem in IRREGULAR_LEMMAS.items()
    )
    nouns = ", ".join(_sql_quote(n) for n in SURU_NOUNS)
    suru = " ".join(
        f"WHEN length({term}) > {len(form)} "
        f"AND right({term}, {len(form)}) = {_sql_quote(form)} "
        f"AND substr({term}, 1, length({term}) - {len(form)}) IN ({nouns}) "
        f"THEN substr({term}, 1, length({term}) - {len(form)}) || 'する'"
        for form in _SURU_FORMS
    )
    whens = " ".join(
        f"WHEN regexp_matches({term}, '{_INFLECTABLE_RE}') "
        f"AND {term} NOT IN ({aux}) "
        f"AND {term} LIKE {_sql_quote('%' + sfx)} AND length({term}) > {len(sfx)} "
        f"THEN substr({term}, 1, length({term}) - {len(sfx)}) || {_sql_quote(rep)}"
        for sfx, rep in LEMMA_RULES
    )
    return f"CASE {irr} {suru} {whens} ELSE {term} END"


def pos_lemma_case_sql(term: str, lemma: str) -> str:
    """pos_of_lemma() as SQL over (surface, lemma) columns."""
    return (
        f"CASE WHEN {lemma} != {term} THEN "
        f"(CASE WHEN regexp_matches({lemma}, '^[ぁ-ゖ]+$') "
        f"AND length({lemma}) > {_GLUED_KANA_LEN} THEN '助詞-係助詞' "
        f"WHEN {lemma} LIKE '%い' THEN '形容詞-自立' ELSE '動詞-自立' END) "
        f"ELSE {pos_case_sql(term)} END"
    )


# ------------------------------------------------------ python oracle ----


def lemma_py(tok: str) -> str:
    """Pure-Python twin of lemma_of()."""
    import re

    if tok in IRREGULAR_LEMMAS:
        return IRREGULAR_LEMMAS[tok]
    for form in _SURU_FORMS:
        if tok.endswith(form) and len(tok) > len(form):
            stem = tok[: -len(form)]
            if stem in SURU_NOUNS:
                return stem + "する"
    if tok not in AUXILIARIES and re.fullmatch(_INFLECTABLE_RE.strip("^$"), tok):
        for sfx, rep in LEMMA_RULES:
            if tok.endswith(sfx) and len(tok) > len(sfx):
                return tok[: -len(sfx)] + rep
    return tok


def _pos_py(tok: str) -> str:
    """Pure-Python twin of pos_of() (surface rules)."""
    import re

    if tok in SEGMENT_LEXICON:
        return "名詞-一般"
    if re.fullmatch(r"[ァ-ヶー]+", tok):
        return "名詞-固有名詞" if len(tok) >= 4 else "名詞-一般"
    if re.fullmatch(r"[一-龯々]+", tok):
        return "名詞-一般"
    if re.match(r"[A-Z]", tok):
        return "名詞-固有名詞"
    if re.match(r"[a-z]", tok):
        return "名詞-一般"
    if re.fullmatch(r"[0-9]+", tok):
        return "名詞-数"
    if tok in PARTICLES:
        return "助詞-格助詞"
    if tok in AUXILIARIES:
        return "助動詞"
    if re.fullmatch(r"[ぁ-ゖ]+", tok) and len(tok) > _GLUED_KANA_LEN:
        return "助詞-係助詞"  # particle-glued residue
    if tok.endswith("い"):
        return "形容詞-自立"
    if tok[-1] in VERB_SUFFIXES:
        return "動詞-自立"
    return "助詞-係助詞"


def tokenize_pos_py(text: str) -> list[tuple[str, str, float]]:
    """Pure-Python twin of segment+lemma+pos+weights for pytest oracles:
    (LEMMA, pos, weight) per kept token, weight-0 tokens dropped — the
    lemma is the tuple's term because the reference keys tf/df on
    word.Lemma (summary.go:51-95, token.Features()[6])."""
    import re

    out: list[tuple[str, str, float]] = []
    for tok in re.findall(SEGMENT_RE, text):
        lemma = lemma_py(tok)
        if lemma != tok:
            if re.fullmatch(r"[ぁ-ゖ]+", lemma) and len(lemma) > _GLUED_KANA_LEN:
                pos = "助詞-係助詞"  # particle-glued run's mangled lemma
            elif lemma.endswith("い"):
                pos = "形容詞-自立"
            else:
                pos = "動詞-自立"
        else:
            pos = _pos_py(tok)
        if pos in POS_WEIGHTS:
            w = POS_WEIGHTS[pos]
        else:
            w = 0.0
            for prefix, weight in POS_PREFIX_WEIGHTS.items():
                if pos.startswith(prefix):
                    w = weight
                    break
        if w > 0:
            out.append((lemma, pos, w))
    return out
