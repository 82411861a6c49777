"""Fuzz parity: the vectorized parse stage must agree with the pure-Python
oracle (blogparser_spark.oracle.pyref.parse_record) on adversarial random
payloads — quotes, angle brackets, control chars, CJK, half-built tags,
boundary-length bodies. Seeded, deterministic."""

from __future__ import annotations

import random

FRAGMENTS = [
    '<h1>{w} title</h1>',
    '<meta property="og:title" content="{w} og">',
    "<title>{w} t</title>",
    '<meta name="title" content="{w} m">',
    "<h1>bad <b>mark</b></h1>",
    '<span class="date">2023-10-20</span>',
    '<span class="date">not a date</span>',
    '<time datetime="2023-09-15">x</time>',
    '<script type="application/ld+json">{{"datePublished": "2023-06-12T15:30:00Z"}}</script>',
    "<script>ld_blog_vars = {{ articles : [ {{ title : '{w} ld' }} ], tags : ['A{w}','B'] }};</script>",
    '<meta name="keywords" content="k1, {w}, ブログ">',
    '<span class="skin-categoryLabel">テーマ：{w}</span>',
    '<div class="skin-entryThemes"><a>{w}テーマ</a><a>Th2</a></div>',
    '<dd class="article-category1">{w}cat</dd>',
    '<div class="POST_TAIL"><span class="TIME"><a href="/i9">{w}ex</a></span></div>',
    '<div class="taglist"><a>#{w}</a><a>t2</a></div>',
    '<div class="tagcloud"><a>{w}cloud</a></div>',
    '<span itemprop="articleSection">{w}sec2</span>',
    '<div class="skin-entryBody">scoped {w} <ins class="adsbygoogle">AD</ins> tail</div>',
    '<meta property="article:section" content="{w}sec">',
    '<meta property="og:image" content="https://stat.ameba.jp/u/x{n}_s.jpg">',
    '<img src="data:image/png;base64,AAA="><img data-src="https://e.com/{n}.png" src="https://e.com/lazy.gif">',
    "<!-- comment {w} -->",
    "<script>junk()</script><style>.x{{}}</style>",
    '<ins class="adsbygoogle">AD</ins>',
    "１位：rank ",
    'quotes "here" and \n newline',
    "control\x01char",
    "あいうえお。かきくけこ。さしすせそ",
    "{w} " * 30,
    "x" * 99,
    "y" * 100,
    "<div>unclosed",
    "| 心理カウンセラー・中井亜紀『成長の記録』",
    # nesting / case / entity adversaries (balanced mini-engine + re-encode)
    '<div class="skin-entryBody">s<div>deep {w}</div><ins class="adsbygoogle">AD</ins>e</div>',
    '<div class="taglist"><div><a>{w}n1</a></div><a>n2</a></div>',
    "&quot;{w}&amp; &#39;ent&#34;",
    'say "hi" & {w} <b class="q">bold</b>',
    "</script> stray close",
    "<SPAN ITEMPROP=\"articleSection\">{w}CASED</SPAN>",
    '<div class="tags"><a>{w}</a><div>mid</div><a>after-nest</a></div>',
]

CONTAINERS = [
    '<div class="entry-content">{body}</div>',
    '<div class="article-body-inner">{body}</div>',
    "<article>{body}</article>",
    "<main>{body}</main>",
    "{body}",
    # nested same-name containers: balanced close must not truncate at the
    # first inner close tag
    '<div class="entry-content">pre<div class="pic">nest</div>{body}<div>tail</div></div>',
    "<article>lead<article>inner</article>{body}</article>",
    '<DIV class="entry-content">{body}</DIV>',
    '<div class="entry-content">{body}',  # unclosed: auto-close at EOF
    # lazy-fast-path adversaries: a mismatched close for an alternation
    # selector, a wildcard (itemprop) open closed by a different tag, and
    # a self-closed open before a later real close
    '<div id="content">{body}</main>mismatch tail',
    '<span itemprop="articleBody">{body}</div>',
    '<div class="entry-content"/>{body}</div>',
]


def gen_payloads(n: int = 250, seed: int = 1234) -> list[str]:
    rng = random.Random(seed)
    words = "alpha beta gamma delta epsilon zeta".split()
    out = []
    for i in range(n):
        k = rng.randint(1, 6)
        frags = [
            rng.choice(FRAGMENTS).format(w=rng.choice(words), n=i) for _ in range(k)
        ]
        body = rng.choice(FRAGMENTS).format(w=rng.choice(words), n=i) + " ".join(
            rng.choice(words) for _ in range(rng.randint(0, 60))
        )
        payload = "".join(frags) + rng.choice(CONTAINERS).format(body=body)
        out.append(payload)
    return out


def test_parse_stage_fuzz_matches_pyref(spark):
    from datetime import datetime

    from blogparser_spark.operators.parse import parse_stage
    from blogparser_spark.oracle import pyref

    payloads = gen_payloads()
    rows = [
        (f"c{i:04d}", 0, "user", t, "none", datetime(2024, 1, 1))
        for i, t in enumerate(payloads)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {r["conv_id"]: r for r in parse_stage(df).collect()}

    mismatches = []
    for i, text in enumerate(payloads):
        want = pyref.parse_record(text)
        g = got[f"c{i:04d}"]
        for field in ("parse_status", "title", "summary", "slug", "first_image"):
            w, s = getattr(want, field), g[field]
            if (w or None if field != "parse_status" else w) != (
                s or None if field != "parse_status" else s
            ):
                mismatches.append((i, field, w, s, text[:120]))
        if sorted(want.tags or []) != sorted(g["tags"] or []):
            mismatches.append((i, "tags", want.tags, g["tags"], text[:120]))
        if sorted(want.categories or []) != sorted(g["categories"] or []):
            mismatches.append((i, "categories", want.categories, g["categories"], text[:120]))
    assert not mismatches, f"{len(mismatches)} mismatches, first 5: {mismatches[:5]}"
