"""Unicode NFC normalization (functions/unicodefns.py): adversarial
composition shapes vs CPython's unicodedata reference, Arrow (not
row-Python) execution, and DuckDB-native cross-check."""

from __future__ import annotations

import unicodedata

import duckdb

from ocr_platform_spark.functions.unicodefns import with_nfc

CASES = [
    "cafe\u0301",
    "A\u030aberg",
    "s\u0307\u0323urface",     # combining marks out of canonical order
    "\ufb01le",                 # ligature: NFC-invariant
    "plain",
    "ko\u0301\u0302pia",
    "\u1e69",                   # already composed
    "A\u0316\u0301\u0300",    # stacked above+below marks
    "\uac00\u1100\u1161",     # Hangul syllable + decomposed jamo pair
    "",
]


def test_nfc_matches_unicodedata_and_duckdb(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "i int, raw string"
    )
    got = {
        r["i"]: (r["norm"], r["changed"], r["len_before"], r["len_after"])
        for r in with_nfc(df, "raw").collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(CASES):
        ref = unicodedata.normalize("NFC", t)
        db = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert got[i][0] == ref == db, (i, t, got[i][0], ref, db)
        assert got[i][1] == (ref != t)
        assert got[i][2] == len(t) and got[i][3] == len(ref)


def test_nfc_runs_on_arrow_not_row_python(spark):
    df = spark.createDataFrame([(1, "café")], "i int, raw string")
    plan = with_nfc(df, "raw")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
