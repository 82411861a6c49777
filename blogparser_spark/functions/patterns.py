"""The shared regex bank: compiled once at module import.

This module is the single source of truth for every extraction pattern; both
the pure-Python oracle layer (blogparser_spark.oracle.pyref) and the
Arrow-vectorized parse UDF (blogparser_spark.operators.parse) import from
here, so parity between the two is structural, not incidental.

The banks re-express the reference's CSS-selector + regex extraction chains
(which are DOM queries in Go, parser/title.go:18-73, parser/content.go:16-113,
parser/category.go:18-111, parser/tag.go:17-110, parser/date.go:20-90,
parser/image.go:20-92) as priority-ordered regex chains over the raw text
payload. The reference recompiles its regexes per document
(parser/title.go:28, parser/category.go:74, parser/tag.go:69); here every
pattern is compiled exactly once per Python worker.

Known, documented deviations from DOM semantics (pinned in tests):
  - nested same-name tags inside a content container are not handled (the
    fixture generator never nests them);
  - CleanContent does not re-serialize through an HTML parser, so the Go
    side's entity re-encoding (clean_content_test.go:121-124) is not
    reproduced.
"""

from __future__ import annotations

import re

# --------------------------------------------------------------------------
# Title (parser/title.go:18-73) — 5-level priority chain, first match wins
# --------------------------------------------------------------------------

# (1) ld_blog_vars articles title — regex from title.go:28, applied only to
#     text containing the ld_blog_vars marker (title.go:25-35 scans <script>s)
LD_BLOG_VARS_MARKER = "ld_blog_vars"
TITLE_LD_BLOG_VARS = re.compile(r"articles\s*:\s*\[\s*\{\s*[^}]*?title\s*:\s*'([^']*)'")

# (2) og:title meta (title.go: meta[property='og:title']@content) —
#     attribute order is free in HTML, so two orderings
TITLE_OG_A = re.compile(
    r"<meta[^>]*property=[\"']og:title[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
TITLE_OG_B = re.compile(
    r"<meta[^>]*content=[\"']([^\"']*)[\"'][^>]*property=[\"']og:title[\"']", re.I
)

# (3) first h1 text
TITLE_H1 = re.compile(r"<h1[^>]*>([\s\S]*?)</h1>", re.I)
# (4) <title> text
TITLE_TAG = re.compile(r"<title[^>]*>([\s\S]*?)</title>", re.I)
# (5) meta[name='title']@content
TITLE_META_NAME_A = re.compile(
    r"<meta[^>]*name=[\"']title[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
TITLE_META_NAME_B = re.compile(
    r"<meta[^>]*content=[\"']([^\"']*)[\"'][^>]*name=[\"']title[\"']", re.I
)

# cleanTitle (parser/title.go:76-87)
SITE_NAME_SUFFIX = "| 心理カウンセラー・中井亜紀『成長の記録』"
WS_RUN = re.compile(r"\s+")
# isValidTitle (parser/title.go:90-109): no <>, no control chars except \t\n\r
CONTROL_CHARS = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
ANGLE = re.compile(r"[<>]")

STRIP_TAGS = re.compile(r"<[^>]+>")

# --------------------------------------------------------------------------
# Content (parser/content.go:16-113) — selector priority list → regex bank.
# Each entry captures the container's inner payload; the candidate is kept if
# its normalized form is ≥ 100 **bytes** (content.go:139-151, Go len()).
# --------------------------------------------------------------------------


def _div_class(cls: str) -> re.Pattern[str]:
    return re.compile(
        r"<div[^>]*class=[\"'][^\"']*" + re.escape(cls) + r"[^\"']*[\"'][^>]*>([\s\S]*?)</div>",
        re.I,
    )


def _any_id(el_id: str) -> re.Pattern[str]:
    return re.compile(
        r"<(?:div|main|section)[^>]*id=[\"']" + re.escape(el_id) + r"[\"'][^>]*>([\s\S]*?)</(?:div|main|section)>",
        re.I,
    )


# mirrors contentSelectors order, parser/content.go:24-40, then main, then
# body. Each entry carries a lowercase LITERAL needle that must appear for
# the regex to possibly match — the vectorized extractor uses it as a
# C-speed contains() prefilter before paying for the backtracking regex
# (necessary-not-sufficient, so priority semantics are unchanged).
CONTENT_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    ("article-body-inner", _div_class("article-body-inner")),
    ("skin-entrybody", _div_class("skin-entryBody")),
    ("articletext", _div_class("articleText")),
    ("post-main", _div_class("post-main")),
    ("post-body", _div_class("post-body")),
    ("entry-content", _div_class("entry-content")),
    ("post_body", _div_class("POST_BODY")),
    ("<article", re.compile(r"<article[^>]*>([\s\S]*?)</article>", re.I)),
    (
        "itemprop",
        re.compile(
            r"<[a-z]+[^>]*itemprop=[\"']articleBody[\"'][^>]*>([\s\S]*?)</[a-z]+>", re.I
        ),
    ),
    ("post-content", _div_class("post-content")),
    ("article-content", _div_class("article-content")),
    ("content", _any_id("content")),
    ("main-content", _any_id("main-content")),
    ("content", _div_class("content")),
    ("<main", re.compile(r"<main[^>]*>([\s\S]*?)</main>", re.I)),
    ("<body", re.compile(r"<body[^>]*>([\s\S]*?)</body>", re.I)),
]

MIN_CONTENT_BYTES = 100  # content.go:146 — bytes, not runes

# --------------------------------------------------------------------------
# CleanContent (parser/clean_content.go:13-48)
# --------------------------------------------------------------------------

HTML_COMMENT = re.compile(r"<!--[\s\S]*?-->")
RANK_MARKER = re.compile(r"[１-９一二三四五六七八九十]位：")
# removeTags bank (clean_content.go:13-25): script/style/iframe + ad/SNS classes
BLOCK_TAGS = re.compile(r"<(script|style|iframe)\b[^>]*>[\s\S]*?</\1>", re.I)
AD_CLASSES = (
    "google-auto-placed",
    "adsbygoogle",
    "blogroll-ad",
    "social-btn",
    "share-btn",
    "twitter-share-button",
    "sns-share",
    "ad-area",
)
AD_ELEMENT = re.compile(
    r"<([a-z]+)[^>]*class=[\"'][^\"']*(?:" + "|".join(AD_CLASSES) + r")[^\"']*[\"'][^>]*>[\s\S]*?</\1>",
    re.I,
)
# self-closing / void ad elements (e.g. <ins class="adsbygoogle"/>)
AD_VOID = re.compile(
    r"<[a-z]+[^>]*class=[\"'][^\"']*(?:" + "|".join(AD_CLASSES) + r")[^\"']*[\"'][^>]*/?>",
    re.I,
)

# --------------------------------------------------------------------------
# Categories (parser/category.go:18-111) — first non-empty bank wins
# --------------------------------------------------------------------------

CATEGORY_SELECTOR_PATTERNS: list[re.Pattern[str]] = [
    re.compile(
        r"<[a-z]+[^>]*class=[\"'][^\"']*(?:skin-categoryLink|entry-category|category-link|categoryLink|crumb-category)[^\"']*[\"'][^>]*>([^<]*)<",
        re.I,
    ),
]
# stage 2: ld_blog_vars categories block (category.go:74) — block then names
CATEGORY_LD_BLOCK = re.compile(r"categories\s*:\s*\[([^\]]*)\]")
CATEGORY_LD_NAME = re.compile(r"name\s*:\s*'([^']*)'")
# stage 3: meta article:section
CATEGORY_META_SECTION = re.compile(
    r"<meta[^>]*property=[\"']article:section[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
# stage 4: .category element text
CATEGORY_CLASS = re.compile(
    r"<[a-z]+[^>]*class=[\"']category[\"'][^>]*>([^<]*)<", re.I
)
# cleanCategory prefixes (category.go:114-141)
CATEGORY_PREFIXES = ("テーマ：", "テーマ:", "Theme：", "Theme:")

# --------------------------------------------------------------------------
# Tags (parser/tag.go:17-110) — ALL banks accumulate (union), dedup preserves
# first occurrence (tag.go:59,77,90,102 / category.go:166-168)
# --------------------------------------------------------------------------

TAG_SELECTOR_PATTERNS: list[re.Pattern[str]] = [
    re.compile(
        r"<[a-z]+[^>]*class=[\"'][^\"']*(?:hashtag-module__item__text|tag-link|entry-tag\b|post-tag\b|tagLink)[^\"']*[\"'][^>]*>([^<]*)<",
        re.I,
    ),
]
TAG_LD_BLOCK = re.compile(r"tags\s*:\s*\[([^\]]*)\]")  # tag.go:69
TAG_LD_ITEM = re.compile(r"'([^']*)'")  # tag.go:72
TAG_META_KEYWORDS = re.compile(
    r"<meta[^>]*name=[\"']keywords[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
TAG_CLASS = re.compile(
    r"<[a-z]+[^>]*class=[\"'](?:tag|tags|entry-tags|post-tags)[\"'][^>]*>([^<]*)<", re.I
)
# cleanTag (parser/tag.go:113-134)
TAG_DELETE_LITERALS = (SITE_NAME_SUFFIX, "ブログ")

# --------------------------------------------------------------------------
# Date (parser/date.go:20-137)
# --------------------------------------------------------------------------

JSONLD_SCRIPT = re.compile(
    r"<script[^>]*type=[\"']application/ld\+json[\"'][^>]*>([\s\S]*?)</script>", re.I
)
DATE_PUBLISHED = re.compile(r"\"datePublished\"\s*:\s*\"([^\"]*)\"")  # date.go:93-110
TIME_DATETIME = re.compile(r"<time[^>]*datetime=[\"']([^\"']*)[\"']", re.I)
TIME_TEXT = re.compile(r"<time[^>]*>([\s\S]*?)</time>", re.I)
DATE_META_PUBLISHED_TIME = re.compile(
    r"<meta[^>]*property=[\"']article:published_time[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
DATE_META_PUBDATE = re.compile(
    r"<meta[^>]*name=[\"']pubdate[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
DATE_META_DATE = re.compile(
    r"<meta[^>]*name=[\"']date[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
DATE_CLASS = re.compile(r"<[a-z]+[^>]*class=[\"']date[\"'][^>]*>([^<]*)<", re.I)

# parseDateString layouts (parser/date.go:113-137) as Python strptime formats.
# Python accepts non-zero-padded month/day, so Go's padded/non-padded layout
# pairs collapse into one format each.
DATE_FORMATS: tuple[str, ...] = (
    "%Y-%m-%dT%H:%M:%S%z",  # RFC3339 / ±hh:mm / Z
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%d",
    "%Y/%m/%d %H:%M",
    "%Y/%m/%d",
    "%Y年%m月%d日 %H:%M",
    "%Y年%m月%d日",
    "%Y.%m.%d",
)

# Spark-side equivalents (Java DateTimeFormatter); Japanese layouts go through
# a regexp_replace pre-pass (\d+)年(\d+)月(\d+)日 → $1-$2-$3 first.
SPARK_DATE_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ssX",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd",
    "yyyy/MM/dd HH:mm",
    "yyyy/MM/dd",
    "yyyy.MM.dd",
    "yyyy-M-d H:mm",
    "yyyy-M-d",
)

# --------------------------------------------------------------------------
# Images (parser/image.go:20-128)
# --------------------------------------------------------------------------

IMG_OG = re.compile(
    r"<meta[^>]*property=[\"']og:image[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
IMG_OG_DESC = re.compile(
    r"<meta[^>]*property=[\"']og:description[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
IMG_TWITTER = re.compile(
    r"<meta[^>]*name=[\"']twitter:image[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
IMG_TWITTER_DESC = re.compile(
    r"<meta[^>]*name=[\"']twitter:description[\"'][^>]*content=[\"']([^\"']*)[\"']", re.I
)
IMG_TAG = re.compile(r"<img\b[^>]*>", re.I)
IMG_ATTR = {
    name: re.compile(name + r"=[\"']([^\"']*)[\"']", re.I)
    for name in ("data-src", "src", "alt", "width", "height")
}
FIGURE_WITH_CAPTION = re.compile(
    r"<figure[^>]*>([\s\S]*?)<figcaption[^>]*>([\s\S]*?)</figcaption>[\s\S]*?</figure>", re.I
)
AMEBLO_HOST = re.compile(r"^https?://[^/]*ameblo\.jp/|^https?://stat\.ameba\.jp/", re.I)
AMEBLO_THUMB = re.compile(r"_[sm]\.")

# --------------------------------------------------------------------------
# Summary (parser/summary.go) & slug (pkg/models/blog.go:26-50)
# --------------------------------------------------------------------------

SUMMARY_MAX_RUNES = 300  # summary.go:164-171 — runes, not bytes
SUMMARY_ELLIPSIS = "・・・"
SENTENCE_DELIM = "。"  # splitSentences, summary.go:244-254

SLUG_NON_ASCII = re.compile(r"[^a-z0-9 ]")  # blog.go:42-50 after lower()
SLUG_SEP = re.compile(r"[^a-z0-9]+")  # blog.go:26-39

# posWeights (parser/summary.go:23-30) — the broadcast lookup dim
POS_WEIGHTS: dict[str, float] = {
    "名詞-固有名詞": 2.0,
    "名詞-一般": 1.5,
    "動詞-自立": 1.2,
    "形容詞-自立": 1.2,
    "副詞-一般": 0.8,
    "名詞-副詞可能": 0.7,
}
POS_PREFIX_WEIGHTS: dict[str, float] = {"名詞": 1.0, "動詞": 0.9, "形容詞": 0.9}
BM25_K1 = 1.2  # summary.go:17-21
BM25_B = 0.75
