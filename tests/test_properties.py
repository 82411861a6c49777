"""Property-based tests (hypothesis) over the pure-Python oracle layer —
invariants that must hold for ANY input, not just fixture payloads. The
reference has no property testing (SURVEY.md §5.1); these pin the contracts
the vectorized implementations are separately proven equal to."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from blogparser_spark.oracle import pyref

text_strat = st.text(max_size=400)
title_strat = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120
)


@given(title_strat)
@settings(max_examples=300, deadline=None)
def test_truncate_summary_bounds(s):
    out = pyref.truncate_summary(s)
    assert len(out) <= 303
    if len(s) <= 300:
        assert out == s
    else:
        assert out[:300] == s[:300] and out.endswith("・・・")


@given(title_strat)
@settings(max_examples=300, deadline=None)
def test_slug_charset_invariant(s):
    slug = pyref.set_slug(s)
    assert all(c.islower() or c.isdigit() or c == "-" for c in slug)
    assert not slug.startswith("-") and not slug.endswith("-")
    assert "--" not in slug


@given(text_strat)
@settings(max_examples=300, deadline=None)
def test_split_sentences_no_empties_no_delimiter(s):
    sents = pyref.split_sentences(s)
    assert all(x and "。" not in x and x == x.strip() for x in sents)


@given(st.lists(st.text(max_size=10), max_size=30))
@settings(max_examples=200, deadline=None)
def test_dedup_preserves_first_occurrence_order(items):
    out = pyref.dedup_preserve_order(items)
    assert len(set(out)) == len(out)
    assert set(out) == set(items)
    seen = []
    for x in items:
        if x not in seen:
            seen.append(x)
    assert out == seen


@given(title_strat)
@settings(max_examples=300, deadline=None)
def test_clean_title_never_leaves_outer_whitespace(s):
    out = pyref.clean_title(s)
    assert out == out.strip()
    assert "\n" not in out


@given(text_strat)
@settings(max_examples=300, deadline=None)
def test_parse_record_total_no_crash(s):
    """parse_record is TOTAL: any input maps to a record with a known status
    — the per-row error-isolation contract (sample/main.go:35-37)."""
    rec = pyref.parse_record(s)
    assert rec.parse_status in {
        "ok",
        "no_title",
        "invalid_title",
        "no_content",
        "empty_after_clean",
        "short_content",
    }
    if rec.parse_status == "ok":
        assert rec.title and rec.body


@given(text_strat)
@settings(max_examples=200, deadline=None)
def test_normalize_html_idempotent(s):
    once = pyref.normalize_html(s)
    assert pyref.normalize_html(once) == once


# markup-ish strategy: interleave text with tag-like fragments so the
# balanced engine and renderer passes actually fire
_frag = st.one_of(
    st.text(max_size=20),
    st.sampled_from(
        ["<div>", "</div>", "<div class='a b'>", "<span>", "</span>", "<br/>",
         "<img src='x'>", "&quot;", "&amp;", "'", '"', "<", ">",
         '<div class="entry-content">', "</DIV>", "<script>x</script>"]
    ),
)
markup_strat = st.lists(_frag, max_size=12).map("".join)


@given(markup_strat)
@settings(max_examples=300, deadline=None)
def test_close_unclosed_tags_balances(s):
    """After the auto-close pass, every non-void open token has a matching
    close downstream (scanning with the same tokenizer)."""
    from blogparser_spark.functions import patterns as P

    out = P.close_unclosed_tags(s)
    # append-only except the WHATWG EOF-in-tag neutralization of a trailing
    # unterminated '<…' fragment (escaped to text, never dropped)
    assert out.startswith(s) or out.replace("&lt;", "<").startswith(s)
    stack = []
    for m in P._TAG_TOKEN.finditer(out):
        closing, name, selfclosed = m.group(1), m.group(2).lower(), m.group(3)
        if closing:
            if name in stack:
                while stack and stack.pop() != name:
                    pass
        elif not selfclosed and name not in P.VOID_ELEMENTS:
            stack.append(name)
    assert stack == []
    assert P.close_unclosed_tags(out) == out  # idempotent


@given(markup_strat)
@settings(max_examples=300, deadline=None)
def test_reencode_entities_idempotent_and_tag_preserving(s):
    """Renderer re-encode is idempotent (escape∘unescape fixpoint) and
    never alters double-quoted tag tokens."""
    from blogparser_spark.functions import patterns as P

    once = P.reencode_entities(s)
    assert P.reencode_entities(once) == once
    # text nodes of the output never hold a raw special
    for i, part in enumerate(P._TAG_SPLIT.split(once)):
        if i % 2 == 0:
            assert not any(c in part for c in "<>\"'")


@given(markup_strat)
@settings(max_examples=200, deadline=None)
def test_balanced_extractor_spans_sane(s):
    """ElementPattern elements are non-overlapping, in order, with inner
    spans inside element spans."""
    from blogparser_spark.functions.patterns import _class_attr, _el_re

    pat = _el_re(_class_attr("entry-content"), "div")
    prev_end = 0
    for el in pat.iter_elements(s):
        assert prev_end <= el.start < el.inner_start <= el.inner_end <= el.end
        assert s[el.inner_start : el.inner_end] == el.inner
        prev_end = el.end


@given(markup_strat)
@settings(max_examples=200, deadline=None)
def test_clean_content_still_total_on_markup(s):
    rec = pyref.parse_record(s)
    assert rec.parse_status in {
        "ok", "no_title", "invalid_title", "no_content",
        "empty_after_clean", "short_content",
    }
