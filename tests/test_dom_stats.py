"""DOM-structure statistics kernel: hand-verified counts, error-as-data,
determinism under fuzz, and the mapInArrow operator's schema/invariance."""

from __future__ import annotations

from ocr_platform_spark.kernels.dom_stats import FIELDS, dom_stats


def test_hand_verified_counts():
    html = (
        b"<html><head><title>T</title></head>"
        b"<body><div><p>hello world</p>"
        b"<p>two <a href='/x'>links</a> and <a href='/y'>more</a></p>"
        b"<ul><li>item</li></ul></div>"
        b"<img src='x.png'><br/>"
        b"<script>var a = '<p>never text</p>';</script>"
        b"<!-- no comment text either -->"
        b"</body></html>"
    )
    s = dom_stats(html)
    # start tags: html head title body div p p a a ul li img br = 13
    assert s["n_tags"] == 13
    assert s["n_links"] == 2
    # block tags present: body, div, p, p, li = 5
    assert s["n_blocks"] == 5
    # html > body > div > ul > li = 5 deep (head/title closed before body)
    assert s["max_depth"] == 5
    # script interior and comment contribute NOTHING to text
    text_chars = s["n_chars_text"]
    assert text_chars == len("T") + len("hello world") + len(
        "two "
    ) + len("links") + len(" and ") + len("more") + len("item")
    assert s["n_chars_raw"] == len(html.decode())


def test_non_html_and_errors_degrade_to_zeros():
    for payload in (None, b"", b"%PDF-1.4 whatever"):
        s = dom_stats(payload)
        assert s == {f: 0 for f in FIELDS}
    # tag soup never raises; unterminated tag counts as text, not markup
    s = dom_stats(b"<div><p>unclosed everywhere <a href")
    assert s["n_tags"] == 2  # div, p (the truncated <a never tokenizes)
    assert s["n_links"] == 0
    assert s["max_depth"] == 2
    assert "unclosed everywhere" in " " * 0 + "unclosed everywhere"  # doc anchor
    assert s["n_chars_text"] >= len("unclosed everywhere <a href")


def test_misnested_unwind_matches_content_parser_semantics():
    # <b> left open inside <p>; closing </div> unwinds through both
    s = dom_stats(b"<div><p>x<b>y</div>z")
    assert s["n_tags"] == 3
    assert s["max_depth"] == 3
    # trailing z is text at depth 0 after the unwind
    assert s["n_chars_text"] == 3


def test_deterministic_and_crash_free_fuzz():
    from hypothesis import given, settings, strategies as st

    frag = st.one_of(
        st.text(alphabet="ab <>/=\"'&;!-x", max_size=24),
        st.sampled_from(
            ["<p>", "</p>", "<div>", "</div>", "<a href='x'>", "</a>",
             "<br/>", "<!-- c -->", "<script>", "</script>", "text here",
             "<img>", "</b>", "<b>"]
        ),
    )

    @settings(max_examples=120, deadline=None, derandomize=True, database=None)
    @given(st.lists(frag, max_size=16).map("".join))
    def check(s):
        data = s.encode()
        out1 = dom_stats(data)
        out2 = dom_stats(data)
        assert out1 == out2
        assert all(out1[f] >= 0 for f in FIELDS)
        assert out1["n_chars_text"] <= out1["n_chars_raw"]

    check()


def test_operator_schema_and_parallelism_invariance(spark):
    from pyspark.sql import functions as F

    from ocr_platform_spark.operators.corpus_spark import documents_df
    from ocr_platform_spark.operators.extract import dom_stats_df

    docs = documents_df(spark, 300)
    out16 = dom_stats_df(docs.repartition(16))
    out3 = dom_stats_df(docs.repartition(3))
    h16 = out16.select(F.bit_xor(F.xxhash64(*out16.columns))).first()[0]
    h3 = out3.select(F.bit_xor(F.xxhash64(*out3.columns))).first()[0]
    assert h16 == h3
    assert out16.count() == 300
    row = out16.where(F.col("n_chars_raw") > 0).first()
    assert row["n_tags"] > 0 and row["max_depth"] > 0
    # no per-row Python UDF: the plan is a single mapInArrow over the scan
    plan = out16._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
