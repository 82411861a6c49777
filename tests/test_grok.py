"""Grok mini-compiler: DSL expansion, field capture, Spark extraction."""

from __future__ import annotations

import re

import pytest

from blogparser_spark.functions.grok import GROK_BANK, compile_grok


def test_compile_basic_capture_and_literal_escape():
    rx, fields = compile_grok("%{IP:client} - %{WORD:method} (%{INT:code})")
    assert fields == ["client", "method", "code"]
    m = re.fullmatch(rx, "10.2.3.4 - GET (200)")
    assert m.groups() == ("10.2.3.4", "GET", "200")
    # literal parens were escaped, not treated as groups
    assert re.fullmatch(rx, "10.2.3.4 - GET 200") is None


def test_unnamed_pattern_matches_without_capturing():
    rx, fields = compile_grok("%{IP} %{WORD:w}")
    assert fields == ["w"]
    assert re.fullmatch(rx, "1.2.3.4 hi").groups() == ("hi",)


def test_unknown_pattern_raises():
    with pytest.raises(KeyError):
        compile_grok("%{NOPE:x}")


def test_custom_bank_and_nesting():
    bank = {"HOSTPORT": r"%{IP}:%{INT}"}
    rx, fields = compile_grok("%{HOSTPORT:hp}", bank=bank)
    assert re.fullmatch(rx, "1.2.3.4:8080").group(1) == "1.2.3.4:8080"


def test_bank_patterns_all_compile_and_match_samples():
    samples = {
        "INT": "-42",
        "NUMBER": "3.14",
        "WORD": "abc_1",
        "NOTSPACE": "a/b:c",
        "IP": "192.168.0.1",
        "QUOTEDSTRING": '"hello world"',
        "TIMESTAMP_ISO8601": "2024-06-01T12:00:00.123+02:00",
        "LOGLEVEL": "ERROR",
        "UUID": "123e4567-e89b-12d3-a456-426614174000",
        "PATH": "/var/log/app.log",
    }
    for name, sample in samples.items():
        assert re.fullmatch(GROK_BANK[name], sample), name


def test_grok_extract_spark(spark):
    from blogparser_spark.functions.grok import grok_extract

    df = spark.createDataFrame(
        [
            ("[2024-01-01 10:00:00] INFO user=u1 evt=click id=7",),
            ("malformed line",),
        ],
        "text string",
    )
    rows = grok_extract(
        df,
        "[%{TIMESTAMP_ISO8601:ts}] %{LOGLEVEL:level} "
        "user=%{NOTSPACE:user} evt=%{WORD:evt} id=%{INT:id}",
    ).collect()
    good = next(r for r in rows if r["id"] == "7")
    assert (good["ts"], good["level"], good["user"], good["evt"]) == (
        "2024-01-01 10:00:00", "INFO", "u1", "click",
    )
    bad = next(r for r in rows if r["id"] != "7")
    assert bad["ts"] == "" and bad["level"] == ""  # non-match → empty strings


def test_nested_named_captures_align_with_fields():
    """Outer group opens before nested named captures — fields[i] must map
    to capture group i+1 even with nested %{...:name} refs."""
    bank = {"HOSTPORT": r"%{IP:ip}:%{INT:port}"}
    rx, fields = compile_grok("%{HOSTPORT:hp} %{WORD:w}", bank=bank)
    assert fields == ["hp", "ip", "port", "w"]
    m = re.fullmatch(rx, "1.2.3.4:8080 ok")
    assert dict(zip(fields, m.groups())) == {
        "hp": "1.2.3.4:8080", "ip": "1.2.3.4", "port": "8080", "w": "ok",
    }


def test_grok_extract_custom_bank(spark):
    from blogparser_spark.functions.grok import grok_extract

    df = spark.createDataFrame([("9.9.9.9:443 up",)], "text string")
    r = grok_extract(
        df, "%{HOSTPORT:hp} %{WORD:state}",
        bank={"HOSTPORT": r"%{IP}:%{INT}"},
    ).collect()[0]
    assert r["hp"] == "9.9.9.9:443" and r["state"] == "up"


def test_compile_typed_suffixes():
    from blogparser_spark.functions.grok import compile_grok_typed

    rx, fields = compile_grok_typed(
        "%{INT:code:int} %{NUMBER:dur:float} %{WORD:tag}"
    )
    assert fields == [("code", "int"), ("dur", "float"), ("tag", None)]
    m = re.fullmatch(rx, "-3 2.5 ok")
    assert m.groups() == ("-3", "2.5", "ok")
    # untyped view drops the suffixes but keeps names/order
    rx2, names = compile_grok("%{INT:code:int} %{WORD:tag}")
    assert names == ["code", "tag"]


def test_unknown_type_suffix_raises():
    with pytest.raises(KeyError):
        compile_grok("%{INT:code:decimal}")


def test_grok_extract_typed_and_matched(spark):
    from blogparser_spark.functions.grok import grok_extract

    df = spark.createDataFrame(
        [
            ("code=7 dur=1.5",),
            ("totally bogus",),
            ("code=x dur=y",),
        ],
        "text string",
    )
    out = grok_extract(
        df, "code=%{INT:code:int} dur=%{NUMBER:dur:float}",
        with_matched=True,
    )
    assert dict(out.dtypes) == {
        "code": "bigint", "dur": "double", "grok_matched": "boolean"
    }
    rows = {r["grok_matched"]: r for r in out.collect()}
    assert rows[True]["code"] == 7 and rows[True]["dur"] == 1.5
    # both mismatch shapes route to the dead-letter side with NULL fields
    bad = [r for r in out.collect() if not r["grok_matched"]]
    assert len(bad) == 2
    assert all(r["code"] is None and r["dur"] is None for r in bad)


def test_grok_roundtrip_property():
    """Property: for ANY literal filler (regex metacharacters included) and
    any sampled bank patterns, the compiled grok expression fullmatches a
    line constructed from matching samples and extracts them verbatim."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    samples = {
        "INT": "-7", "NUMBER": "2.5", "WORD": "ab1", "IP": "10.0.0.9",
        "LOGLEVEL": "WARN", "UUID": "123e4567-e89b-12d3-a456-426614174000",
        "PATH": "/a/b.c", "QUOTEDSTRING": '"q q"',
    }
    # literals must not contain % (grok ref syntax) and must not be empty
    literal = st.text(
        alphabet=st.characters(exclude_characters="%", codec="ascii",
                               exclude_categories=("Cs", "Cc")),
        min_size=1, max_size=8,
    ).filter(lambda s: s.strip() != "")
    names = st.sampled_from(sorted(samples))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(names, literal), min_size=1, max_size=4))
    def check(parts):
        pattern, line, expect = "", "", []
        for i, (name, lit) in enumerate(parts):
            field = f"f{i}"
            pattern += f"%{{{name}:{field}}}{lit}"
            line += samples[name] + lit
            expect.append(samples[name])
        rx, fields = compile_grok(pattern)
        m = re.fullmatch(rx, line)
        # a literal can extend a greedy sample's match (e.g. INT followed
        # by digits), so only require: if it matches, extraction is a
        # consistent split whose concatenation rebuilds the line
        if m:
            rebuilt = ""
            for i, (name, lit) in enumerate(parts):
                rebuilt += m.group(i + 1) + lit
            assert rebuilt == line
            assert fields == [f"f{i}" for i in range(len(parts))]

        # typed variant: suffixing :int/:float on numeric refs must leave
        # the compiled REGEX unchanged (coercion is post-extraction) and
        # record the suffixes aligned with the same fields
        from blogparser_spark.functions.grok import compile_grok_typed

        suffix = {"INT": ":int", "NUMBER": ":float"}
        tpat = "".join(
            f"%{{{name}:f{i}{suffix.get(name, '')}}}{lit}"
            for i, (name, lit) in enumerate(parts)
        )
        trx, tfields = compile_grok_typed(tpat)
        assert trx == rx
        assert [f for f, _ in tfields] == [f"f{i}" for i in range(len(parts))]
        for (name, _lit), (_f, typ) in zip(parts, tfields):
            assert typ == {"INT": "int", "NUMBER": "float"}.get(name)

    check()


def test_grok_extract_multi_first_match_wins(spark):
    from blogparser_spark.functions.grok import grok_extract_multi

    df = spark.createDataFrame(
        [
            ("code=7 dur=1.5",),          # matches pattern 0
            ("evt:click uid:u9 seq:4",),  # matches pattern 1
            ("code=8 dur=0.5 evt:x uid:y seq:9",),  # both -> first wins
            ("nothing here",),            # dead letter
        ],
        "text string",
    )
    out = grok_extract_multi(
        df,
        [
            "code=%{INT:code:int} dur=%{NUMBER:dur:float}",
            "evt:%{WORD:evt} uid:%{NOTSPACE:uid} seq:%{INT:code:int}",
        ],
    )
    assert dict(out.dtypes) == {
        "code": "bigint", "dur": "double", "evt": "string",
        "uid": "string", "grok_pattern_idx": "int",
    }
    rows = out.collect()
    by_idx = {}
    for r in rows:
        by_idx.setdefault(r["grok_pattern_idx"], []).append(r)
    assert len(by_idx[0]) == 2  # the both-match line routed to pattern 0
    assert {r["code"] for r in by_idx[0]} == {7, 8}
    assert all(r["evt"] is None and r["uid"] is None for r in by_idx[0])
    (p1,) = by_idx[1]
    assert (p1["evt"], p1["uid"], p1["code"], p1["dur"]) == ("click", "u9", 4, None)
    (dead,) = by_idx[None]
    assert all(dead[f] is None for f in ("code", "dur", "evt", "uid"))


def test_grok_extract_multi_type_conflict_raises(spark):
    from blogparser_spark.functions.grok import grok_extract_multi

    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        grok_extract_multi(
            df, ["a=%{INT:v:int}", "b=%{NUMBER:v:float}"]
        )


def test_commonapachelog_composite(spark):
    """The canonical grok pattern: %{COMMONAPACHELOG} alone parses a
    Common Log Format line through nested named captures, with the
    :int-typed response/bytes landing as bigints."""
    from blogparser_spark.functions.grok import compile_grok_typed, grok_extract

    line = (
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326'
    )
    rx, fields = compile_grok_typed("%{COMMONAPACHELOG}")
    assert [f for f, _ in fields] == [
        "clientip", "ident", "auth", "timestamp", "verb", "request",
        "httpversion", "response", "bytes",
    ]
    assert dict(fields)["response"] == "int" and dict(fields)["bytes"] == "int"
    m = re.fullmatch(rx, line)
    assert m and m.group(1) == "127.0.0.1" and m.group(5) == "GET"

    df = spark.createDataFrame([(line,), ("not a log line",)], "text string")
    out = {r["clientip"]: r for r in
           grok_extract(df, "%{COMMONAPACHELOG}", with_matched=True).collect()}
    good = out["127.0.0.1"]
    assert good["response"] == 200 and good["bytes"] == 2326
    assert good["verb"] == "GET" and good["request"] == "/apache_pb.gif"
    assert good["timestamp"] == "10/Oct/2000:13:55:36 -0700"
    bad = out[""]
    assert not bad["grok_matched"] and bad["response"] is None
