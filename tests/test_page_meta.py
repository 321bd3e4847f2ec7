"""Page-metadata kernel (kernels/page_meta.py): field extraction on
handcrafted heads, the ''≡absent convention, dialect parity Python re ↔
DuckDB RE2 on adversarial shapes, and corpus wiring."""

from __future__ import annotations

import duckdb
import pytest

from ocr_platform_spark.kernels.page_meta import FIELDS, page_metadata, sql_exprs


def _meta(html: str) -> dict:
    return page_metadata(html.encode("utf-8"))


def test_full_head():
    m = _meta(
        '<!DOCTYPE html><html lang="en-US"><head><title>My Page</title>'
        '<meta name="description" content="a summary here">'
        '<link rel="canonical" href="https://x.org/p/1">'
        '<meta property="og:title" content="OG My Page">'
        '<meta property="og:locale" content="en_US">'
        '<meta name="robots" content="noindex">'
        '<link rel="alternate" hreflang="de" href="https://x.org/p/1?hl=de">'
        '<link rel="alternate" hreflang="fr" href="https://x.org/p/1?hl=fr">'
        "</head><body><p>hi</p></body></html>"
    )
    assert m["title"] == "My Page"
    assert m["description"] == "a summary here"
    assert m["canonical"] == "https://x.org/p/1"
    assert m["lang"] == "en-US"
    assert m["og_title"] == "OG My Page"
    assert m["og_locale"] == "en_US"
    assert m["robots"] == "noindex"
    assert m["n_hreflang"] == 2


def test_reversed_attribute_orders():
    m = _meta(
        "<html><head>"
        '<meta content="rev desc" name="description">'
        '<link href="https://x.org/c" rel="canonical">'
        '<meta content="rev og" property="og:title">'
        "</head></html>"
    )
    assert m["description"] == "rev desc"
    assert m["canonical"] == "https://x.org/c"
    assert m["og_title"] == "rev og"


def test_absent_and_empty_are_null():
    m = _meta("<html><head><title></title><meta name=\"description\" content=\"\"></head></html>")
    # empty title text and empty content both read as absent (the
    # DuckDB-round-trip convention)
    assert m["title"] is None
    assert m["description"] is None
    assert m["canonical"] is None and m["robots"] is None
    assert m["n_hreflang"] == 0


def test_single_quoted_attributes_out_of_contract():
    m = _meta("<html><head><meta name='description' content='nope'></head></html>")
    assert m["description"] is None


def test_case_insensitive_and_first_match_wins():
    m = _meta(
        "<HTML LANG=\"de\"><HEAD><TITLE>Erste</TITLE><title>zweite</title></HEAD></HTML>"
    )
    assert m["title"] == "Erste"
    assert m["lang"] == "de"


def test_pdf_and_empty_payloads():
    assert page_metadata(b"%PDF-1.4 whatever")["title"] is None
    assert page_metadata(b"")["raw"] == ""
    assert page_metadata(None)["n_hreflang"] == 0


def test_lang_requires_whitespace_boundary():
    # 'xml:lang' / 'data-lang' style prefixes must not satisfy the lang
    # pattern's required whitespace before the attribute name
    m = _meta('<html data-lang="xx"><head></head></html>')
    assert m["lang"] is None


ADVERSARIAL = [
    "",
    "<html><head><title>plain</title></head></html>",
    '<html lang=""><head><meta name="description" content=""></head></html>',
    '<meta content="c-first" name="description"><meta name="description" content="n-first">',
    '<link rel="canonical"><link rel="canonical" href="https://a/b">',
    '<META NAME="ROBOTS" CONTENT="NOINDEX, NOFOLLOW">',
    '<html\nlang="fr-CA"\ndir="ltr"><head><title>\nmulti\nline\n</title></head>',
    '<meta property="og:locale" content="pt_BR"><meta property="og:title" content="x&amp;y">',
    'hreflang="a" HREFLANG="b" data-hreflang="c"',
    '<title attr=">">angle in attr</title>',
    '<meta name="descriptionx" content="not this">',
    '<link rel="alternate" hreflang="es" href="u"><link hreflang="en" rel="alternate">',
]


def test_dialect_parity_python_vs_duckdb():
    """The kernel's Python-re evaluation and the oracle's RE2 evaluation
    must agree field-for-field on adversarial inputs — this is the
    contract extract_page_metadata's oracle rests on."""
    con = duckdb.connect()
    exprs = sql_exprs("raw")
    sel = ", ".join(f"{exprs[f]} AS {f}" for f in FIELDS) + f", {exprs['n_hreflang']} AS n_hreflang"
    for raw in ADVERSARIAL:
        got_py = page_metadata(raw.encode("utf-8"))
        row = con.execute(f"SELECT {sel} FROM (SELECT ? AS raw)", [raw]).fetchone()
        got_sql = dict(zip([*FIELDS, "n_hreflang"], row))
        for f in FIELDS:
            assert got_py[f] == got_sql[f], (f, raw, got_py[f], got_sql[f])
        assert got_py["n_hreflang"] == got_sql["n_hreflang"], raw


_ALT_ADVERSARIAL = [
    # plain pair, document order
    '<link rel="alternate" hreflang="de" href="https://x.org/?hl=de">',
    # two pairs — list alignment must hold
    '<link hreflang="a" href="u1"><link hreflang="b" href="u2">',
    # reversed attribute order: out of contract, reads as absent
    '<link rel="alternate" href="u" hreflang="es">',
    # hreflang with NO href in the same tag must not bleed into the next tag
    '<link hreflang="fr" rel="alternate"><link rel="next" href="u9">',
    # empty values drop after the zip
    '<link hreflang="" href="u"><link hreflang="x" href="">',
    # uppercase tag + newline whitespace
    '<LINK\nhreflang="pt" href="u-pt">',
]


def test_alternates_parity_python_vs_duckdb():
    """hreflang_alternates (Python re) must agree pair-for-pair with the
    oracle's RE2 unnest-zip — the contract hreflang_frontier_seeds rests
    on. The no-href case pins that [^>]*? cannot cross a tag boundary."""
    from ocr_platform_spark.kernels.page_meta import (
        alternates_sql_exprs,
        hreflang_alternates,
    )

    con = duckdb.connect()
    langs_sql, hrefs_sql = alternates_sql_exprs("raw")
    for raw in _ALT_ADVERSARIAL:
        got_py = hreflang_alternates(raw)
        rows = con.execute(
            f"SELECT unnest({langs_sql}) AS l, unnest({hrefs_sql}) AS h "
            "FROM (SELECT ? AS raw)",
            [raw],
        ).fetchall()
        got_sql = [(lg, hf) for lg, hf in rows if lg and hf]
        assert got_py == got_sql, (raw, got_py, got_sql)


def test_alternates_parity_python_vs_spark(spark):
    """Third engine: Spark's JVM regexp_extract_all over the same pattern
    — the form the catalog query executes — matches the Python pairs."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.kernels.page_meta import _ALT_HH, hreflang_alternates

    df = spark.createDataFrame([(i, s) for i, s in enumerate(_ALT_ADVERSARIAL)], "i int, raw string")
    pat = F.lit(_ALT_HH.pattern)
    out = (
        df.select(
            "i",
            F.arrays_zip(
                F.regexp_extract_all("raw", pat, F.lit(1)).alias("l"),
                F.regexp_extract_all("raw", pat, F.lit(2)).alias("h"),
            ).alias("z"),
        )
        .collect()
    )
    for r in out:
        got_spark = [(p["l"], p["h"]) for p in r["z"] if p["l"] and p["h"]]
        assert got_spark == hreflang_alternates(_ALT_ADVERSARIAL[r["i"]])


def test_corpus_pages_carry_metadata(spark):
    """The synthetic corpus emits every metadata field somewhere, and the
    operator's per-field coverage matches the generator's draw rates."""
    from ocr_platform_spark.operators.corpus_spark import documents_df
    from ocr_platform_spark.operators.extract import page_metadata_df

    meta = page_metadata_df(documents_df(spark, 300)).cache()
    try:
        n = meta.count()
        assert n == 300
        from pyspark.sql import functions as F

        cov = meta.agg(
            *[F.count(f).alias(f) for f in FIELDS],
            F.sum("n_hreflang").alias("alts"),
        ).first()
        # html pages are ~85% of the corpus; fields appear at their
        # generator rates — just assert presence, not exact proportions
        assert cov["title"] > 200
        assert 0 < cov["description"] < n
        assert 0 < cov["canonical"] < n
        assert cov["lang"] > 200
        assert 0 < cov["robots"] < cov["description"]
        assert cov["alts"] > 0
    finally:
        meta.unpersist()


@pytest.mark.parametrize("n", [60])
def test_metadata_parallelism_invariance(spark, n):
    """North-rule shape: kernel output is a pure function of the payload,
    independent of partitioning."""
    from ocr_platform_spark.operators.corpus_spark import documents_df
    from ocr_platform_spark.operators.extract import page_metadata_df

    docs = documents_df(spark, n)
    a = sorted(page_metadata_df(docs.repartition(1)).collect(), key=lambda r: r["url"])
    b = sorted(page_metadata_df(docs.repartition(17)).collect(), key=lambda r: r["url"])
    assert a == b
