"""Winnowing (rolling-hash) document fingerprints: MOSS guarantee and
equivalence of the single-pass array formulation to the exploded
window-frame formulation (the shape the oracle reproduces in SQL)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ocr_platform_spark.functions.textfns import char_kgram_hashes, winnow_fingerprints

K, W = 8, 4


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog while the cat sleeps"
    rows = [
        (1, base),
        (2, base),  # exact duplicate → identical fingerprint set
        (3, "completely different content about spark window aggregation"),
        # shares a long substring (>= w + k - 1 = 11 chars) with doc 1
        (4, "prefix text then the quick brown fox jumps over suffix"),
        (5, "ab"),  # shorter than k
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_winnow_properties(spark):
    out = {
        r["doc_id"]: r["fps"]
        for r in _docs(spark)
        .select("doc_id", winnow_fingerprints("text", K, W).alias("fps"))
        .collect()
    }
    assert out[1] == out[2]  # deterministic, content-defined
    assert set(out[1]).isdisjoint(set(out[3]) - set(out[1])) or out[1] != out[3]
    # MOSS guarantee: shared substring of length >= w+k-1 → shared fingerprint
    assert set(out[1]) & set(out[4])
    # density: winnowing keeps far fewer than all grams
    n_grams = (
        _docs(spark)
        .where("doc_id = 1")
        .select(F.size(char_kgram_hashes("text", K)).alias("n"))
        .first()["n"]
    )
    assert 0 < len(out[1]) < n_grams
    # degenerate inputs still fingerprint (single gram)
    assert len(out[5]) == 1 and len(out[6]) == 1


def test_array_formulation_matches_window_frame(spark):
    """The production single-pass array operator must select exactly the
    same fingerprint set as the exploded window-frame computation that the
    catalog query / DuckDB oracle run."""
    docs = _docs(spark).where("doc_id <= 4")
    grams = docs.select(
        "doc_id", F.posexplode(char_kgram_hashes("text", K)).alias("pos0", "h")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    wmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, W - 1)
    wdoc = Window.partitionBy("doc_id")
    exploded = (
        grams.select(
            "doc_id",
            "pos",
            F.min("h").over(wmin).alias("win_min"),
            F.max("pos").over(wdoc).alias("n_grams"),
        )
        .where(F.col("pos") <= F.greatest(F.col("n_grams") - (W - 1), F.lit(1)))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("win_min")).alias("fps"))
    )
    array_form = docs.select("doc_id", winnow_fingerprints("text", K, W).alias("fps"))
    got_e = {r["doc_id"]: r["fps"] for r in exploded.collect()}
    got_a = {r["doc_id"]: r["fps"] for r in array_form.collect()}
    assert got_e == got_a


def test_top_bigram_frac_matches_exploded_form(spark):
    """The per-row sort+max-run formulation equals the exploded
    max(count)/sum(count) formulation — the math the funnel oracle runs."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.functions.textfns import top_bigram_frac, word_shingles

    rows = [
        (1, "a b a b a b c"),
        (2, "x"),
        (3, ""),
        (4, "one two three four five six seven"),
        (5, "spam spam spam spam spam"),
        (6, "the cat sat on the cat sat on the mat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    per_row = {
        r["doc_id"]: r["f"]
        for r in df.select("doc_id", top_bigram_frac("text").alias("f")).collect()
    }
    exploded = {
        r["doc_id"]: r["f"]
        for r in (
            df.select("doc_id", F.explode(word_shingles("text", 2)).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("doc_id")
            .agg((F.max("c").cast("double") / F.sum("c")).alias("f"))
            .collect()
        )
    }
    assert per_row == exploded


def test_script_level_lang_id(spark):
    """Unicode-block script gate: CJK/Cyrillic/Arabic pages identify by
    script before any stopword matching; kana beats han (Japanese text
    carries both); the Latin-dominance guard keeps quoting pages Latin;
    sub-threshold snippets fall through to the stopword tier."""
    from ocr_platform_spark.corpus import gen_multilingual_batch
    from ocr_platform_spark.functions.textfns import lang_id

    rows = [(r["doc_id"], r["lang"], r["text"]) for r in gen_multilingual_batch(20)]
    df = spark.createDataFrame(rows, "doc_id long, planted string, text string")
    got = df.select("planted", lang_id("text").alias("pred")).collect()
    assert got and all(r["pred"] == r["planted"] for r in got)

    edge = spark.createDataFrame(
        [
            (1, "the of and in that with to something english 日本"),  # 2 han chars: stays en
            (2, "日本語のテキストです ひらがな入り"),                    # kana+han -> ja, not zh
            (3, "汉字"),                                                # 2 chars < threshold -> und
            (4, "Смешанный текст with many english words the and of to in that"),
            (5, None),
            (6, ""),
        ],
        "i long, text string",
    )
    pred = {r["i"]: r["pred"] for r in edge.select("i", lang_id("text").alias("pred")).collect()}
    assert pred[1] == "en"
    assert pred[2] == "ja"
    assert pred[3] == "und"
    # 4: cyrillic chars ~ latin count decides via 2*cyr >= latin
    assert pred[4] in ("ru", "en")
    assert pred[6] == "und"


def test_script_lang_id_duckdb_parity(spark, tmp_path):
    """The script-gate SQL (generated from the same textfns constants)
    matches Spark row-for-row on the multilingual fixture pages plus
    adversarial mixed rows."""
    import duckdb

    from ocr_platform_spark.corpus import gen_multilingual_batch
    from ocr_platform_spark.functions.textfns import lang_id
    from ocr_platform_spark.queries import (
        _SCRIPT_COUNTS_SQL,
        _SCRIPT_WHENS_SQL,
        _STOP_RE,
    )
    from ocr_platform_spark.functions import textfns as TX

    rows = [(r["doc_id"], r["text"]) for r in gen_multilingual_batch(15)] + [
        (100, "the of and in that with to something english 日本"),
        (101, "日本語のテキストです ひらがな入り"),
        (102, "汉字"),
        (103, "mixed 한국어 단어 넷 here the and of"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs")
    df.write.mode("overwrite").parquet(path)
    got = {r["doc_id"]: r["pred"] for r in df.select("doc_id", lang_id("text").alias("pred")).collect()}
    scores = ", ".join(
        f"len(regexp_extract_all(lower(text), '{_STOP_RE[lang]}')) AS s_{lang}"
        for lang, _ in TX.LANG_PROFILES
    )
    whens = " ".join(
        f"WHEN s_{lang} = greatest(s_en, s_de, s_es, s_fr, s_hi) THEN '{lang}'"
        for lang, _ in TX.LANG_PROFILES
    )
    con = duckdb.connect()
    sql = f"""
      SELECT doc_id,
        CASE {_SCRIPT_WHENS_SQL}
             WHEN greatest(s_en, s_de, s_es, s_fr, s_hi) = 0 THEN 'und'
             {whens}
        END AS pred
      FROM (SELECT doc_id, {scores}, {_SCRIPT_COUNTS_SQL}
            FROM read_parquet('{path}/*.parquet'))
    """
    ora = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == ora


def test_mixed_script_words_flags_straddlers_only(spark):
    from ocr_platform_spark.functions.textfns import mixed_script_words

    df = spark.createDataFrame(
        [
            (1, "pаypal login"),          # Cyrillic а inside Latin word
            (2, "Москва photos"),  # fully Cyrillic word + Latin word
            (3, "plain ascii text"),
            (4, "miсrosoft сhase"),  # two spoofed words
        ],
        "id long, text string",
    )
    got = {
        r["id"]: sorted(r["m"])
        for r in df.select("id", mixed_script_words("text").alias("m")).collect()
    }
    assert got[1] == ["pаypal"]
    assert got[2] == []          # no single word mixes scripts
    assert got[3] == []
    assert got[4] == sorted(["miсrosoft", "сhase"])
