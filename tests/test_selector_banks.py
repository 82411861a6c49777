"""Full selector-bank coverage: every one of the reference's 22 category
selectors (parser/category.go:26-54) and 28+4 tag selectors
(parser/tag.go:25-54, 96-108) extracts through the regex mini-engine.

Golden cases are ports of category_test.go:58-124 / tag_test.go:25-55; the
per-selector cases pin each bank individually so a regression in one
selector names itself.
"""

from __future__ import annotations

import pytest

from blogparser_spark.functions import patterns as P
from blogparser_spark.oracle import pyref as R

# ---- ports of the reference's own tests ----


def test_go_extract_categories_selectors():
    """category_test.go:58-72."""
    html = (
        '<div class="skin-categoryLabel">カテゴリ1</div>'
        '<div class="skin-categoryLabel">カテゴリ2</div>'
    )
    assert R.extract_categories(html) == ["カテゴリ1", "カテゴリ2"]


def test_go_extract_categories_ld_blog_vars():
    """category_test.go:74-88."""
    html = "<script>var ld_blog_vars = {articles:[{categories:[{name:'カテゴリA'}]}]};</script>"
    assert R.extract_categories(html) == ["カテゴリA"]


def test_go_extract_tags_union():
    """tag_test.go:25-48 — membership + count (Go checks exactly that)."""
    html = (
        "<meta name='keywords' content='kw1, kw2'>"
        "<div class='skin-tagLabel'>TagA</div>"
        "<script>var ld_blog_vars={tags:['TagB','TagC']};</script>"
        "<div class='tags'><a>TagD</a></div>"
        "<div class='tag'>TagE</div>"
    )
    got = R.finalize_tags(html)
    assert sorted(got) == sorted(["TagA", "TagB", "TagC", "kw1", "kw2", "TagD", "TagE"])


# ---- every category selector individually (category.go:26-54) ----

CATEGORY_CASES = [
    ('<div class="skin-categoryLabel">C</div>', ".skin-categoryLabel"),
    ("<span data-uranus-component='theme'>C</span>", "[data-uranus-component='theme']"),
    ('<div class="skin-entryThemes"><a>C</a></div>', ".skin-entryThemes a"),
    ('<span class="skin-categoryTag">C</span>', ".skin-categoryTag"),
    (
        "<div data-analytics-index-name='theme'><span>C</span></div>",
        "[data-analytics-index-name='theme'] span",
    ),
    ('<div class="theme"><a>C</a></div>', "div.theme a"),
    ('<span class="skinTheme">C</span>', ".skinTheme"),
    ('<li class="theme"><a>C</a></li>', "li.theme a"),
    ('<div class="subHeader-theme">C</div>', ".subHeader-theme"),
    ('<a class="theme-link">C</a>', "a.theme-link"),
    ('<dd class="article-category1">C</dd>', "dd.article-category1"),
    ('<dd class="article-category2">C</dd>', "dd.article-category2"),
    (
        '<div class="POST_TAIL"><span class="TIME"><a href="/i42">C</a></span></div>',
        '.POST_TAIL .TIME a[href*="/i"]',
    ),
    ('<p class="articleTheme">C</p>', ".articleTheme"),
    ("<a rel='category'>C</a>", "a[rel='category']"),
    ('<div class="category"><a>C</a></div>', ".category a"),
    ('<div class="cat-links"><a>C</a></div>', ".cat-links a"),
    ('<div class="entry-categories"><a>C</a></div>', ".entry-categories a"),
    ('<div class="post-categories"><a>C</a></div>', ".post-categories a"),
    ("<span itemprop='articleSection'>C</span>", "[itemprop='articleSection']"),
    ('<div class="tags"><a>C</a></div>', ".tags a"),
    ("<a rel='category tag'>C</a>", "a[rel='category tag']"),
]


@pytest.mark.parametrize("html,selector", CATEGORY_CASES, ids=[c[1] for c in CATEGORY_CASES])
def test_each_category_selector(html, selector):
    assert R.extract_categories(html) == ["C"], selector


def test_category_bank_count_matches_reference():
    """22 selectors in category.go:26-54."""
    assert len(P.CATEGORY_SELECTOR_BANKS) == 22


# ---- every tag selector individually (tag.go:25-54 + 96-99) ----

TAG_CASES = [
    ('<div class="skin-tagLabel">T</div>', ".skin-tagLabel"),
    ('<div class="skin-entryTags"><a>T</a></div>', ".skin-entryTags a"),
    ('<span class="skin-tag">T</span>', ".skin-tag"),
    ('<div class="tag"><a>T</a></div>', ".tag a"),
    ('<div class="tags"><a>T</a></div>', ".tags a"),
    ('<div class="entry-tags"><a>T</a></div>', ".entry-tags a"),
    ('<div class="post-tags"><a>T</a></div>', ".post-tags a"),
    ('<div class="blog-tags"><a>T</a></div>', ".blog-tags a"),
    ('<div class="article-tags"><a>T</a></div>', ".article-tags a"),
    ('<div class="taglist"><a>T</a></div>', ".taglist a"),
    ('<div class="entryTag"><a>T</a></div>', ".entryTag a"),
    ('<div class="entry_tag"><a>T</a></div>', ".entry_tag a"),
    ('<div class="blogTag"><a>T</a></div>', ".blogTag a"),
    ('<div class="blog_tag"><a>T</a></div>', ".blog_tag a"),
    ('<div class="label"><a>T</a></div>', ".label a"),
    ('<div class="labels"><a>T</a></div>', ".labels a"),
    ('<div class="post-labels"><a>T</a></div>', ".post-labels a"),
    ('<div class="post_label"><a>T</a></div>', ".post_label a"),
    ('<div class="entry-labels"><a>T</a></div>', ".entry-labels a"),
    ('<div class="entry_label"><a>T</a></div>', ".entry_label a"),
    ('<div class="tagcloud"><a>T</a></div>', ".tagcloud a"),
    ('<div class="tagCloud"><a>T</a></div>', ".tagCloud a"),
    ('<div class="tag-list"><a>T</a></div>', ".tag-list a"),
    ('<div class="tagList"><a>T</a></div>', ".tagList a"),
    ('<div class="tag_links"><a>T</a></div>', ".tag_links a"),
    ('<div class="tagLinks"><a>T</a></div>', ".tagLinks a"),
    ('<div class="tag"><a rel="tag">T</a></div>', ".tag a[rel='tag']"),
    ('<span class="hashtag-module__item__text">T</span>', ".hashtag-module__item__text"),
    # stage-4 element-text selectors (tag.go:96-99)
    ('<div class="tag">T</div>', ".tag (text)"),
    ('<div class="tags">T</div>', ".tags (text)"),
    ('<div class="entry-tags">T</div>', ".entry-tags (text)"),
    ('<div class="post-tags">T</div>', ".post-tags (text)"),
]


@pytest.mark.parametrize("html,selector", TAG_CASES, ids=[c[1] for c in TAG_CASES])
def test_each_tag_selector(html, selector):
    assert R.finalize_tags(html) == ["T"], selector


def test_tag_bank_count_matches_reference():
    """28 selectors in tag.go:25-54 + 4 text selectors in tag.go:96-99."""
    assert len(P.TAG_SELECTOR_BANKS) == 28
    assert len(P.TAG_TEXT_BANKS) == 4


# ---- engine semantics ----


def test_class_token_matching_is_exact():
    """cascadia matches class TOKENS: .tag must not fire on class='tags' or
    class='tagged', but must fire on class='a tag b'."""
    assert R.finalize_tags('<div class="tagged"><a>T</a></div>') == []
    assert R.finalize_tags('<div class="x tag y"><a>T</a></div>') == ["T"]
    assert R.extract_categories('<div class="themes"><a>C</a></div>') == []


def test_bank_order_is_selector_order_not_document_order():
    """Accumulation iterates selectors, not document positions
    (category.go:56-66): div.theme a (bank 6) precedes li.theme a (bank 8)
    even when the li comes first in the document."""
    html = '<li class="theme"><a>FromLi</a></li><div class="theme"><a>FromDiv</a></div>'
    assert R.extract_categories(html) == ["FromDiv", "FromLi"]


def test_selector_text_includes_descendants():
    """goquery .Text() concatenates descendant text — nested markup inside a
    matched element is stripped, not rejected."""
    html = '<div class="skin-categoryLabel"><span>部分</span>1</div>'
    assert R.extract_categories(html) == ["部分1"]
