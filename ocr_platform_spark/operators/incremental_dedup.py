"""Incremental near-duplicate detection over a growing corpus.

Batch dedup (operators/dedup.py) recomputes signatures for the whole
corpus each run — fine for one-shot curation, wrong for a crawl that grows
daily. This operator persists MinHash signatures in a snapshot table
(operators/resume.py commit semantics) and, per new batch:

  1. anti-join: only genuinely new ids get signatures computed (J8 — the
     same resume primitive as the extraction pipeline);
  2. candidate pairs: banded LSH join of the NEW signatures against the
     full committed signature table (new×all, never all×all);
  3. verification: signature-estimated Jaccard — the fraction of equal
     MinHash components is an unbiased estimator of the true Jaccard, and
     it needs no document text, so verification runs entirely on the
     (tiny) signature store.

Scale: the signature table is ~100 bytes/doc (16×int64 + id); the per-batch
cost is O(|new| + candidates), independent of corpus size except the banded
join, whose key cardinality grows with the corpus → parallelizes freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ocr_platform_spark.operators.dedup import (
    _staged,
    hashed_shingle_sets,
    minhash_bands,
    minhash_signature_from_hashes,
)
from ocr_platform_spark.operators.resume import SnapshotTable


class SignatureStore:
    """Committed MinHash signatures: (id string, sig array<bigint>)."""

    def __init__(self, path: str, k: int = 16, shingle_words: int = 3) -> None:
        self.table = SnapshotTable(path)
        self.k = k
        self.shingle_words = shingle_words

    def signatures(self, spark: SparkSession) -> DataFrame | None:
        return self.table.read_data(spark)

    def _compute(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        # Same signature family as the batch pipeline (hashed-shingle
        # MinHash) so batch and incremental runs over the same corpus agree.
        hs = hashed_shingle_sets(
            docs.withColumn(id_col, F.col(id_col).cast("string")),
            id_col,
            text_col,
            self.shingle_words,
        )
        return hs.select("id", minhash_signature_from_hashes("hs", self.k).alias("sig"))

    def ingest(
        self, docs: DataFrame, id_col: str, text_col: str, run_id: str
    ) -> DataFrame:
        """Commit signatures for ids not yet in the store; returns the NEW
        signatures (empty when everything was already known). Idempotent on
        run_id."""
        spark = docs.sparkSession
        existing = self.signatures(spark)
        fresh_docs = docs
        if existing is not None:
            fresh_docs = docs.join(
                existing.select(F.col("id").alias(id_col)), id_col, "left_anti"
            )
        new_sigs = self._compute(fresh_docs, id_col, text_col)
        if self.table.is_committed(run_id):
            return new_sigs.limit(0)
        self.table.stage_data(new_sigs, run_id)
        staged = self.table.read_staged(spark, run_id)
        n = staged.count()
        if n == 0:
            self.table.discard_staged(run_id)
            # NOT `staged`: that frame reads the files just discarded and
            # would fail on any downstream action
            return new_sigs.limit(0)
        lineage = staged.groupBy().agg(F.count("*").alias("input_count")).select(
            F.lit(-1).alias("partition_id"),
            "input_count",
            F.lit(0).cast("long").alias("input_bytes"),
            F.lit("minhash-sig").alias("extractor_version"),
            F.lit(0).cast("long").alias("elapsed_ms"),
            F.lit(run_id).alias("run_id"),
        )
        self.table.commit(lineage, run_id)
        return staged


def estimated_jaccard(sig_a: F.Column, sig_b: F.Column, k: int) -> F.Column:
    """Fraction of equal MinHash components — unbiased Jaccard estimator."""
    eq = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return F.round(eq.cast("double") / k, 6)


def incremental_near_duplicates(
    store: SignatureStore,
    new_sigs: DataFrame,
    threshold: float = 0.5,
    rows_per_band: int = 2,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-dup pairs touching at least one NEW document: banded join of
    new signatures against the committed store, then estimator-verified.
    Returns (id_a, id_b, est_jaccard) with id_a < id_b."""
    spark = new_sigs.sparkSession
    all_sigs = store.signatures(spark)
    if all_sigs is None:
        all_sigs = new_sigs
    k = store.k

    def banded(df: DataFrame) -> DataFrame:
        b = df.select(
            "id",
            F.posexplode(minhash_bands("sig", k, rows_per_band)).alias(
                "band_id", "band_hash"
            ),
        )
        # the same deterministic mega-bucket trim as the batch path
        # (dedup._bucket_pairs): a spam cluster of m identical docs would
        # otherwise emit O(m_new · m) candidate rows from one bucket
        wb = Window.partitionBy("band_id", "band_hash").orderBy(F.col("id"))
        return (
            b.withColumn("_rn", F.row_number().over(wb))
            .where(F.col("_rn") <= max_bucket)
            .drop("_rn")
        )

    new_b = banded(new_sigs)
    all_b = banded(all_sigs)
    cands = (
        new_b.alias("n")
        .join(
            all_b.alias("a"),
            (F.col("n.band_id") == F.col("a.band_id"))
            & (F.col("n.band_hash") == F.col("a.band_hash"))
            & (F.col("n.id") != F.col("a.id")),
        )
        .select(
            F.least(F.col("n.id"), F.col("a.id")).alias("id_a"),
            F.greatest(F.col("n.id"), F.col("a.id")).alias("id_b"),
        )
        .distinct()
    )
    # sig_tbl feeds BOTH verification joins — persist so the (parquet-read +
    # union + dedup) subtree runs once, not per join side.
    sig_tbl = _staged(all_sigs.unionByName(new_sigs).dropDuplicates(["id"]))
    j = (
        cands.join(sig_tbl.withColumnRenamed("sig", "sig_a"), cands.id_a == sig_tbl.id)
        .drop("id")
        .join(
            sig_tbl.withColumnRenamed("sig", "sig_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    return (
        j.select("id_a", "id_b", estimated_jaccard(F.col("sig_a"), F.col("sig_b"), k).alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )
