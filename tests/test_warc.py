"""WARC segment source: round-trip fidelity, gzip members, truncation
tolerance, and end-to-end into the extraction kernel."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ocr_platform_spark import corpus
from ocr_platform_spark.operators.extract import extract_documents
from ocr_platform_spark.sources.warc import (
    build_warc_segment,
    read_warc,
    split_warc_records,
    write_warc_segments,
)


def _docs(n):
    return [corpus.gen_doc(i) for i in range(n)]


def test_split_round_trip_plain_and_gzip():
    docs = _docs(10)
    rows = [(d["url"], d["warc_ts"], d["html"]) for d in docs]
    for compress in (False, True):
        seg = build_warc_segment(rows, compress=compress)
        back = list(split_warc_records(seg))
        assert [(u, p) for u, _t, p in back] == [(d["url"], d["html"]) for d in docs]
        assert all(t == d["warc_ts"].replace(microsecond=0) for (_u, t, _p), d in zip(back, docs))


def test_truncated_segment_yields_prefix():
    docs = _docs(5)
    seg = build_warc_segment(
        [(d["url"], d["warc_ts"], d["html"]) for d in docs], compress=False
    )
    cut = seg[: len(seg) - len(docs[-1]["html"]) // 2 - 40]
    back = list(split_warc_records(cut))
    assert 0 < len(back) < 5


def test_read_warc_spark_round_trip(spark, tmp_path):
    docs = _docs(60)
    write_warc_segments(docs, str(tmp_path / "warc"), docs_per_segment=25)
    df = read_warc(spark, str(tmp_path / "warc"))
    got = {r["url"]: bytes(r["html"]) for r in df.collect()}
    assert got == {d["url"]: d["html"] for d in docs}
    # timestamps survive (second precision)
    ts = {r["url"]: r["warc_ts"] for r in df.collect()}
    assert ts[docs[0]["url"]] == docs[0]["warc_ts"].replace(microsecond=0)


def test_warc_to_extraction_end_to_end(spark, tmp_path):
    docs = _docs(40)
    write_warc_segments(docs, str(tmp_path / "warc2"), docs_per_segment=20)
    loaded = read_warc(spark, str(tmp_path / "warc2"))
    ext = extract_documents(loaded)
    joined = ext.join(
        spark.createDataFrame(
            [(d["url"], d["expected_text"]) for d in docs], "url string, expected string"
        ),
        "url",
    )
    assert joined.count() == 40
    assert joined.where(
        F.coalesce("text", F.lit("")) != F.coalesce("expected", F.lit(""))
    ).count() == 0


def test_truncated_gzip_segment_yields_prefix():
    """A cut inside the LAST gzip member must not discard the intact earlier
    members (member-by-member decompression, not one gz.read())."""
    docs = _docs(5)
    seg = build_warc_segment(
        [(d["url"], d["warc_ts"], d["html"]) for d in docs], compress=True
    )
    cut = seg[: len(seg) - 20]  # damage only the final member
    back = list(split_warc_records(cut))
    assert len(back) >= 4
    assert [(u, p) for u, _t, p in back[:4]] == [
        (d["url"], d["html"]) for d in docs[:4]
    ]


def test_fully_corrupt_gzip_yields_nothing():
    assert list(split_warc_records(b"\x1f\x8b" + b"\x00" * 30)) == []


def test_warc_roundtrip_property():
    """Hypothesis: build_warc_segment -> split_warc_records is the identity
    on (url, ts, payload) for arbitrary payload bytes (incl. CRLFs, gzip
    magic, WARC/ prefixes inside payloads) in both compressed and plain
    layouts."""
    from datetime import datetime, timezone

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_platform_spark.sources.warc import build_warc_segment, split_warc_records

    url = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters="\r\n"),
        min_size=1,
        max_size=40,
    )
    payload = st.binary(max_size=300)
    ts = st.datetimes(
        min_value=datetime(1990, 1, 1), max_value=datetime(2030, 1, 1)
    ).map(lambda d: d.replace(microsecond=0))

    @settings(max_examples=120, deadline=None)
    @given(st.lists(st.tuples(url, ts, payload), max_size=6), st.booleans())
    def check(rows, compress):
        seg = build_warc_segment(rows, compress=compress)
        got = list(split_warc_records(seg))
        assert [(u, t, p) for u, t, p in got] == rows

    check()
