"""PII scrub semantics (chain order, counts, pre-filter); the catalog
query `doc_pii_scrub` carries the byte-exact cross-engine oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_platform_spark.functions.piifns import has_pii, pii_counts, scrub_pii


def _run(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    counts = pii_counts("t")
    rows = df.select(
        scrub_pii("t").alias("clean"),
        *[c.alias(n) for n, c in counts],
        has_pii("t").alias("any"),
    ).collect()
    return rows


def test_scrub_and_counts(spark):
    rows = _run(
        spark,
        [
            "write bob@example.com or call 212-555-0199",
            "hosts 10.0.0.1 and 172.16.254.3",
            "clean text with numbers 1234 and 3.14",
        ],
    )
    assert rows[0].clean == "write <EMAIL> or call <PHONE>"
    assert (rows[0].email, rows[0].ipv4, rows[0].phone) == (1, 0, 1)
    assert rows[1].clean == "hosts <IP> and <IP>"
    assert (rows[1].email, rows[1].ipv4, rows[1].phone) == (0, 2, 0)
    assert rows[2].clean == "clean text with numbers 1234 and 3.14"
    assert (rows[2].email, rows[2].ipv4, rows[2].phone) == (0, 0, 0)
    assert [r.any for r in rows] == [True, True, False]


def test_chain_order_disjoint_counts(spark):
    # phone-shaped digits inside an email's local part and an IP inside its
    # domain are consumed by the email stage — later stages never see them.
    rows = _run(spark, ["a212-555-0199@x.com", "user@10.0.0.1 only-ip (email needs alpha TLD)"])
    assert rows[0].clean == "<EMAIL>"
    assert (rows[0].email, rows[0].ipv4, rows[0].phone) == (1, 0, 0)
    assert rows[1].clean == "user@<IP> only-ip (email needs alpha TLD)"
    assert (rows[1].email, rows[1].ipv4, rows[1].phone) == (0, 1, 0)


def test_bare_10_digits_not_matched(spark):
    # no separators -> deliberately NOT phone-matched (too many false
    # positives on ids/timestamps in web text)
    rows = _run(spark, ["order 4155550134 shipped"])
    assert rows[0].clean == "order 4155550134 shipped"
    assert rows[0].phone == 0


def test_phone_not_matched_inside_longer_digit_runs(spark):
    # a digit-led phone shape must not have its tail carved out of a
    # longer identifier run; explicit starts (+1, parens) still match
    rows = _run(
        spark,
        [
            "serial 123456 789-0123 logged",       # tail of an ID run
            "call +1 (415) 555-0134 now",
            "call 1-415-555-0134 now",
            "call (415) 555-0134 now",
            "call 415 555 0134 now",
        ],
    )
    assert rows[0].clean == "serial 123456 789-0123 logged"
    assert rows[0].phone == 0
    for r in rows[1:]:
        assert "<PHONE>" in r.clean and r.phone == 1


def test_card_luhn_spark_matches_reference(spark):
    """The Luhn column expression must agree with a straightforward Python
    Luhn on the standard test numbers and separator variants."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.functions.piifns import card_counts, scrub_cards

    def py_luhn(s):
        ds = [int(c) for c in s if c.isdigit()]
        total = 0
        for i, d in enumerate(reversed(ds)):
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    cases = [
        "4111 1111 1111 1111",      # visa, valid
        "4111 1111 1111 1112",      # off-by-one, invalid
        "378282246310005",          # amex, valid (15 digits)
        "5500-0055-5555-5559",      # mc, valid, dashes
        "4012888888881881",         # visa, valid, bare
        "6011111111111117",         # discover, valid
        "1234567890123",            # 13 digits, invalid
    ]
    rows = [(i, f"pay {c} now") for i, c in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, s string")
    n_shaped, n_valid = card_counts("s")
    got = (
        df.select("i", n_shaped.alias("ns"), n_valid.alias("nv"),
                  scrub_cards("s").alias("clean"))
        .orderBy("i")
        .collect()
    )
    for row, c in zip(got, cases):
        assert row["ns"] == 1, c
        assert row["nv"] == (1 if py_luhn(c) else 0), c
        assert "<CARD>" in row["clean"] and not any(
            ch.isdigit() for ch in row["clean"]
        )
    # non-card digit runs: too short / too long / word-soup text
    clean_rows = [(0, "order 123456789012 ts"), (1, "id 12345678901234567890123"),
                  (2, "no digits"), (3, None)]
    df2 = spark.createDataFrame(clean_rows, "i int, s string")
    n_shaped2, n_valid2 = card_counts(F.coalesce(F.col("s"), F.lit("")))
    got2 = df2.select(n_shaped2.alias("ns"), n_valid2.alias("nv")).collect()
    assert all(r["ns"] == 0 and r["nv"] == 0 for r in got2)
