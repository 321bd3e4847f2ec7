"""Incremental dedup: persisted signatures, anti-join ingest, cross-batch
near-dup detection on the signature estimator."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_platform_spark.operators.incremental_dedup import (
    SignatureStore,
    incremental_near_duplicates,
)

_BASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the quiet river bank today",
    "completely unrelated content about distributed query engines and shuffles",
    "a third document discussing web crawling pipelines and extraction quality",
    "yet another page about storage formats columnar compression and encodings",
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_ingest_is_incremental_and_idempotent(spark, tmp_path):
    store = SignatureStore(str(tmp_path / "sigs"))
    b1 = _docs(spark, [(f"a{i}", t) for i, t in enumerate(_BASE_TEXTS)])
    new1 = store.ingest(b1, "doc_id", "text", run_id="r1")
    assert new1.count() == 4
    assert store.signatures(spark).count() == 4

    # replay same run_id → no-op; overlapping batch → only new ids ingested
    replay = store.ingest(b1, "doc_id", "text", run_id="r1")
    assert replay.count() == 0 or store.signatures(spark).count() == 4
    b2 = _docs(
        spark,
        [("a0", _BASE_TEXTS[0]), ("b0", "totally new text about benchmarks and scaling laws")],
    )
    new2 = store.ingest(b2, "doc_id", "text", run_id="r2")
    assert [r["id"] for r in new2.collect()] == ["b0"]
    assert store.signatures(spark).count() == 5


def test_cross_batch_near_duplicates(spark, tmp_path):
    store = SignatureStore(str(tmp_path / "sigs2"))
    b1 = _docs(spark, [(f"a{i}", t) for i, t in enumerate(_BASE_TEXTS)])
    store.ingest(b1, "doc_id", "text", run_id="r1")

    # batch 2: one near-copy of a1 (one word changed), one novel doc
    near = _BASE_TEXTS[1].replace("shuffles", "exchanges")
    b2 = _docs(spark, [("n1", near), ("n2", "entirely novel content unlike anything prior")])
    new2 = store.ingest(b2, "doc_id", "text", run_id="r2")
    pairs = incremental_near_duplicates(store, new2, threshold=0.4).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("a1", "n1") in found
    assert all("n2" not in p for p in found)
    # estimator within [0,1], high for the near-copy
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert 0.4 <= est[("a1", "n1")] <= 1.0


def test_exact_copy_estimates_one(spark, tmp_path):
    store = SignatureStore(str(tmp_path / "sigs3"))
    b1 = _docs(spark, [("x1", _BASE_TEXTS[0])])
    store.ingest(b1, "doc_id", "text", run_id="r1")
    b2 = _docs(spark, [("x2", _BASE_TEXTS[0])])
    new2 = store.ingest(b2, "doc_id", "text", run_id="r2")
    pairs = incremental_near_duplicates(store, new2, threshold=0.9).collect()
    assert len(pairs) == 1 and pairs[0]["est_jaccard"] == 1.0


def test_ingest_all_known_batch_returns_usable_empty_frame(spark, tmp_path):
    """A fully-known batch discards its stage; the returned frame must be
    empty AND actionable (not a reader of the just-deleted files)."""
    from ocr_platform_spark.operators.incremental_dedup import (
        SignatureStore,
        incremental_near_duplicates,
    )

    docs = spark.createDataFrame(
        [(f"d{i}", f"common text body shared {i} words here") for i in range(8)],
        "doc_id string, text string",
    )
    store = SignatureStore(str(tmp_path / "sigs"))
    first = store.ingest(docs, "doc_id", "text", "r1")
    assert first.count() == 8
    again = store.ingest(docs, "doc_id", "text", "r2")
    assert again.count() == 0  # must not raise file-not-found
    pairs = incremental_near_duplicates(store, again)
    assert pairs.count() == 0
