"""Golden conversion tests — ported expectations from the reference's
``ocr_backend/tests/test_data_conversion.py`` (values, not code), executed
through the column-expression converters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_platform_spark.functions import conversions as C


def _run(spark, conv, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    rows = df.select("raw", conv("raw").alias("r")).collect()
    return {r["raw"]: (r["r"]["value"], r["r"]["error"]) for r in rows}


# --- dates: the 15 formats all normalize to 15/01/2024 (reference :73-86) --
ALL_DATE_FORMS_150124 = [
    "2024-01-15", "15/01/2024", "15-01-2024", "15.01.2024", "2024/01/15",
    "January 15, 2024", "Jan 15, 2024", "15 January 2024", "15 Jan 2024",
    "2024-01-15 14:30:00", "15/01/2024 14:30",
]


def test_date_all_formats(spark):
    out = _run(spark, C.convert_date, ALL_DATE_FORMS_150124)
    for raw, (value, error) in out.items():
        assert value == "15/01/2024", f"{raw!r} -> {value!r}"
        assert error is None


def test_date_mdy_and_regression(spark):
    out = _run(spark, C.convert_date, ["01/15/2024", "01-15-2024", "24-Jun-2025", "24-June-2025"])
    assert out["01/15/2024"][0] == "15/01/2024"   # month-first fallback
    assert out["01-15-2024"][0] == "15/01/2024"
    assert out["24-Jun-2025"][0] == "24/06/2025"  # reference regression :84-86
    assert out["24-June-2025"][0] == "24/06/2025"


def test_date_iso_tz_and_failure(spark):
    out = _run(spark, C.convert_date, ["2024-01-15T14:30:00Z", "not a date"])
    assert out["2024-01-15T14:30:00Z"] == ("15/01/2024", None)
    value, error = out["not a date"]
    assert value == "not a date" and error is not None  # original + error


def test_date_ambiguity_day_first(spark):
    # 05/06/2024: day-first wins (dd/MM before MM/dd in precedence order)
    assert _run(spark, C.convert_date, ["05/06/2024"])["05/06/2024"][0] == "05/06/2024"


# --- numbers (reference :58-71) ---------------------------------------------
def test_number(spark):
    out = _run(spark, C.convert_number, ["42", "42.5", "1,234", "1,234.56", "not-a-number"])
    assert out["42"] == ("42", None)
    assert out["42.5"] == ("42.5", None)
    assert out["1,234"] == ("1234", None)         # int branch: no decimal point
    assert out["1,234.56"] == ("1234.56", None)
    v, e = out["not-a-number"]
    assert v == "not-a-number" and e is not None


def test_integer_float_subtypes(spark):
    assert _run(spark, C.convert_integer, ["42"])["42"] == ("42", None)
    assert _run(spark, C.convert_float, ["42.5"])["42.5"] == ("42.5", None)
    v, e = _run(spark, C.convert_integer, ["42.5"])["42.5"]
    assert v == "42.5" and e is not None  # int("42.5") fails in the reference too


# --- currency (reference :97-100, :202-219) ---------------------------------
def test_currency(spark):
    out = _run(
        spark, C.convert_currency,
        ["$1,234.56", "₹1,23,456.78", "1234.56", "€ 99,99", "-$50.25", "no digits"],
    )
    assert out["$1,234.56"] == ("1234.56", None)
    assert out["₹1,23,456.78"] == ("123456.78", None)
    assert out["1234.56"] == ("1234.56", None)
    assert out["€ 99,99"] == ("9999", None)  # comma = thousands sep, like the reference
    assert out["-$50.25"][0] == "-50.25"
    v, e = out["no digits"]
    assert v == "no digits" and e is not None


def test_currency_typed(spark):
    df = spark.createDataFrame([("₹1,23,456.78",)], "raw string")
    row = df.select(C.currency_typed("raw").alias("d")).first()
    from decimal import Decimal
    assert row["d"] == Decimal("123456.780000")


# --- boolean: the 8+8 token sets (reference data_conversion.py:250-251) -----
def test_boolean_tokens(spark):
    out = _run(spark, C.convert_boolean, C.TRUE_TOKENS + C.FALSE_TOKENS + ["TRUE", "No", "maybe"])
    for t in C.TRUE_TOKENS + ["TRUE"]:
        assert out[t] == ("true", None), t
    for f in C.FALSE_TOKENS + ["No"]:
        assert out[f] == ("false", None), f
    v, e = out["maybe"]
    assert v == "maybe" and e is not None


# --- email (reference :88-95) ------------------------------------------------
def test_email(spark):
    out = _run(spark, C.convert_email, ["USER@Example.COM", "invalid-email", "a@b"])
    assert out["USER@Example.COM"] == ("user@example.com", None)
    assert out["invalid-email"][1] is not None
    assert out["a@b"][1] is not None  # no dot


# --- null/empty → (null, null) (reference :102-108) --------------------------
@pytest.mark.parametrize(
    "conv", [C.convert_text, C.convert_number, C.convert_date, C.convert_email,
             C.convert_currency, C.convert_boolean],
)
def test_null_and_empty(spark, conv):
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "raw string")
    for r in df.select(conv("raw").alias("r")).collect():
        assert r["r"]["value"] is None and r["r"]["error"] is None


# --- dispatch ----------------------------------------------------------------
def test_convert_by_type(spark):
    df = spark.createDataFrame(
        [("42", "number"), ("15/01/2024", "date"), ("x", "unknown_type")],
        "raw string, ft string",
    )
    rows = {r["raw"]: r["r"]["value"] for r in
            df.select("raw", C.convert_by_type("raw", "ft").alias("r")).collect()}
    assert rows["42"] == "42"
    assert rows["15/01/2024"] == "15/01/2024"
    assert rows["x"] == "x"  # unknown type → string passthrough


def test_currency_matches_python_decimal_reference(spark):
    """500 generated currency strings: the Spark column expression agrees
    with a straight Python Decimal reference implementation (the exact
    semantics of data_conversion.py:209-232)."""
    import random
    import re as _re
    from decimal import Decimal, InvalidOperation

    from pyspark.sql import functions as F

    from ocr_platform_spark.functions.conversions import convert_currency

    rng = random.Random(7)
    syms = ["$", "₹", "EUR ", "£", "", "US$ "]
    cases = []
    for _ in range(500):
        whole = rng.randrange(0, 10_000_000)
        cents = rng.randrange(0, 100)
        s = f"{whole:,}" if rng.random() < 0.5 else str(whole)
        raw = f"{rng.choice(syms)}{s}.{cents:02d}"
        if rng.random() < 0.1:
            raw = "-" + raw
        if rng.random() < 0.05:
            raw = "garbage" + raw + "x"  # letters are stripped → still parses
        cases.append(raw)
    cases += ["", "   ", "abc", "--5", "1.2.3", "₹1,23,456.78", "$0.50"]

    def ref(rawv):
        if rawv is None or not rawv.strip():
            return (None, None)
        cleaned = _re.sub(r"[^\d,.\-]", "", rawv.strip()).replace(",", "")
        try:
            return (str(Decimal(cleaned)), None)
        except InvalidOperation:
            return (rawv, "err")

    df = spark.createDataFrame([(c,) for c in cases], "raw string")
    out = df.select("raw", convert_currency("raw").alias("r")).collect()
    for row, raw in zip(out, cases):
        want_value, want_err = ref(raw)
        got_value, got_err = row["r"]["value"], row["r"]["error"]
        assert got_value == want_value, (raw, got_value, want_value)
        assert (got_err is None) == (want_err is None), (raw, got_err)


def test_date_roundtrip_all_formats(spark):
    """Every one of the 15 reference formats round-trips through the
    multi-format parser back to the same date for 3 years of dates."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ocr_platform_spark.functions.conversions import DATE_FORMATS, convert_date

    base = dt.date(2023, 1, 1)
    days = [base + dt.timedelta(days=17 * k) for k in range(65)]
    rows = [(d.strftime("%Y-%m-%d"),) for d in days]
    df = spark.createDataFrame(rows, "iso string")
    ts = F.to_timestamp("iso")
    # US-ordered formats are ambiguous for day <= 12: the parser tries the
    # reference's precedence (dd/MM before MM/dd, data_conversion.py:176-192)
    # so those render-parse roundtrips only hold for unambiguous days.
    ambiguous = {"MM/dd/yyyy", "MM-dd-yyyy"}
    checks = []
    for fmt in DATE_FORMATS:
        rendered = F.date_format(ts, fmt)
        back = convert_date(rendered).getField("value")
        mismatch = F.when(back != F.date_format(ts, "dd/MM/yyyy"), 1).otherwise(0)
        if fmt in ambiguous:
            mismatch = F.when(F.dayofmonth(ts) > 12, mismatch).otherwise(0)
        checks.append(F.sum(mismatch).alias(fmt))
    bad = df.agg(*checks).first()
    for fmt in DATE_FORMATS:
        assert bad[fmt] == 0, f"format {fmt} failed roundtrip"
