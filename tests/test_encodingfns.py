"""Encoding-hygiene functions: the derived mojibake table must equal the
true utf-8-encode/cp1252-decode round trip, repair must invert corrupt,
and the Spark column expressions and generated DuckDB SQL must agree with
the CPython reference chains byte-for-byte."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_platform_spark.functions.encodingfns import (
    MOJIBAKE_CORRUPT_PAIRS,
    MOJIBAKE_PAIRS,
    corrupt_mojibake,
    corrupt_mojibake_sql,
    mojibake_count,
    mojibake_count_sql,
    repair_mojibake,
    repair_mojibake_sql,
)

TABLE_CHARS = [good for _, good in MOJIBAKE_PAIRS]


def py_corrupt(s: str) -> str:
    for bad, good in MOJIBAKE_CORRUPT_PAIRS:
        s = s.replace(good, bad)
    return s


def py_repair(s: str) -> str:
    for bad, good in MOJIBAKE_PAIRS:
        s = s.replace(bad, good)
    return s


def py_count(s: str) -> int:
    return sum(
        (len(s) - len(s.replace(bad, ""))) // len(bad) for bad, _ in MOJIBAKE_PAIRS
    )


def test_table_is_the_codec_truth():
    """Every pair must be exactly what the public codecs produce, and the
    cp1252 holes must be absent (e.g. '”' = e2 80 9d hits the 0x9d hole)."""
    for bad, good in MOJIBAKE_PAIRS:
        assert bad == good.encode("utf-8").decode("cp1252")
    assert "”" not in TABLE_CHARS  # 0x9d hole → not repairable via cp1252
    assert len(MOJIBAKE_PAIRS) == len(MOJIBAKE_CORRUPT_PAIRS)
    assert set(MOJIBAKE_PAIRS) == set(MOJIBAKE_CORRUPT_PAIRS)


def test_corrupt_chain_equals_true_mojibake_and_roundtrips():
    """On any mix of ASCII and table chars, the chain must equal a real
    wrong-codec decode, and repair must invert it (20k randomized cases)."""
    rng = random.Random(9)
    pool = TABLE_CHARS + list("abcdef XYZ.,!?0123\n")
    for _ in range(20000):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(0, 40)))
        truth = s.encode("utf-8").decode("cp1252")
        c = py_corrupt(s)
        assert c == truth, (s, c, truth)
        assert py_repair(c) == s, (s, c)
        assert py_count(c) == sum(1 for ch in s if ch in TABLE_CHARS)
        assert py_count(s) == 0 or any(ch in TABLE_CHARS for ch in s)


def test_repair_real_world_samples():
    cases = {
        "donâ€™t": "don’t",
        "cafÃ©": "café",
        "naÃ¯ve faÃ§ade": "naïve façade",
        "â‚¬99 â€“ 50Â°C": "€99 – 50°C",
        "SÃ£o Paulo â€” ok": "São Paulo — ok",
        "plain ascii": "plain ascii",
    }
    for wire, fixed in cases.items():
        assert py_repair(wire) == fixed
        assert (py_count(wire) > 0) == (wire != fixed)


def test_spark_exprs_match_python_reference(spark):
    rng = random.Random(11)
    pool = TABLE_CHARS + list("word soup e o t .!?")
    samples = [
        "".join(rng.choice(pool) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ] + ["", "donâ€™t cafÃ©"]  # the last one carries PRE-EXISTING mojibake:
    # repair(corrupt(s)) correctly peels that layer too, so parity is
    # asserted against the Python reference chain, not against s itself.
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i int, s string")
    rows = (
        df.select(
            "i",
            corrupt_mojibake("s").alias("c"),
            repair_mojibake(corrupt_mojibake("s")).alias("r"),
            mojibake_count(corrupt_mojibake("s")).alias("n"),
        )
        .orderBy("i")
        .collect()
    )
    for row, s in zip(rows, samples):
        assert row["c"] == py_corrupt(s)
        assert row["r"] == py_repair(py_corrupt(s))
        assert row["n"] == py_count(py_corrupt(s))
        if all(ch in TABLE_CHARS or ord(ch) < 128 for ch in s):
            assert row["r"] == s  # clean input: exact round trip


def test_duckdb_sql_matches_python_reference():
    rng = random.Random(13)
    pool = TABLE_CHARS + list("word soup e o t .!?'")
    samples = [
        "".join(rng.choice(pool) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ] + ["", "donâ€™t cafÃ©", "it's quoted"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, ?)" for i in range(len(samples))) +
                ") v(i, s)", samples)
    rows = con.execute(
        f"SELECT i, {corrupt_mojibake_sql('s')} AS c, "
        f"{repair_mojibake_sql(corrupt_mojibake_sql('s'))} AS r, "
        f"{mojibake_count_sql(corrupt_mojibake_sql('s'))} AS n "
        "FROM t ORDER BY i"
    ).fetchall()
    for (_, c, r, n), s in zip(rows, samples):
        assert c == py_corrupt(s)
        assert r == py_repair(py_corrupt(s))
        assert n == py_count(py_corrupt(s))
        if all(ch in TABLE_CHARS or ord(ch) < 128 for ch in s):
            assert r == s  # clean input: exact round trip


def test_double_encoded_peels_one_layer():
    """Two wrong-codec round trips repair one layer per application —
    detection still fires on the remaining layer."""
    s = "café – ok"
    once = py_corrupt(s)
    twice = once.encode("utf-8").decode("cp1252")
    peeled = py_repair(twice)
    # the outer layer is gone; what remains is the single-encoded form
    # (up to cp1252-hole bytes that a real double encode may destroy)
    assert py_count(peeled) > 0 or peeled == once
    assert py_repair(peeled) == s or py_count(peeled) > 0
