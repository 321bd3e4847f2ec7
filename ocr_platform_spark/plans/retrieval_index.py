"""Composed retrieval-index flagship: raw pages → paragraph chunks →
deterministic trigram-hash embeddings → IVF-PQ index → ADC shortlist →
index-only refine. Every stage is an independently oracle-verified
operator (operators/chunking.py, embed.py, ann.py); this plan is their
composition plus the bookkeeping an index build needs — observe-counted
corpus metrics and a per-list manifest whose audit proves no vector was
lost between chunking and the inverted lists.

Reference scope note: the OCR reference retrieves by exact ids through
SQLAlchemy (`ocr_backend/app/services/document_service.py`); a semantic
index is the web-corpus north star's requirement, not the reference's —
the parity surface here is the engine's own oracled operator chain.

Scale shape at 10^9-10^12 chunks:

- chunking + embedding are map-side only (one Arrow pass; no shuffle
  before the encode);
- training samples are bounded (operators/ann.train_ivfpq collects a
  seeded sample, model-sized);
- encode shuffles once on the coarse list id — the same partitioning the
  inverted lists are stored under, so the probe-side join is co-located;
- the query path never touches raw vectors: ADC scores stream over the
  probed lists' integer codes, and the refine stage reconstructs from
  the model tables (index-only — no second corpus pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_platform_spark.operators import ann
from ocr_platform_spark.operators.chunking import chunk_paragraphs
from ocr_platform_spark.operators.embed import hashed_ngram_embedding

#: chunk_uid = doc_id * UID_STRIDE + chunk_id. chunk_id is bounded by
#: doc_tokens / budget; 10^5 chunks per document ≈ a 4M-token page at the
#: default budget — far past any real page. At 10^12 documents the uid
#: still fits: doc ids up to ~9·10^13 before bigint pressure.
UID_STRIDE = 100_000


def build_retrieval_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 40,
    dim: int = 64,
    n_lists: int = 8,
    m: int = 8,
    k_codes: int = 16,
) -> dict:
    """Build the index: returns ``{"chunks", "emb", "codes", "cents",
    "cb", "cents_df", "cb_df"}``. ``chunks`` carries observe metrics
    (``rix_build``: n_chunks, n_tokens) filled by whichever action first
    touches it; ``codes`` is the inverted-list table (id, list_id, codes);
    ``cents_df``/``cb_df`` are the staged-model relational faces the
    index-only refine and the oracle replay consume."""
    from pyspark.sql import Observation

    spark = docs.sparkSession
    obs = Observation("rix_build")
    chunks = (
        chunk_paragraphs(docs, id_col, text_col, budget_tokens)
        .select(
            (F.col(id_col) * UID_STRIDE + F.col("chunk_id")).alias("chunk_uid"),
            F.col(id_col).alias("_doc"),
            "chunk_id",
            "text",
            "n_tokens",
        )
        .withColumnRenamed("_doc", "doc_id")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
            # DISTINCT aggregates are disallowed in observed metrics; the
            # HLL sketch gives the doc count without a second pass
            F.approx_count_distinct("doc_id").alias("n_docs_approx"),
        )
    )
    emb = hashed_ngram_embedding(chunks, "chunk_uid", "text", dim=dim, as_float=True).select(
        F.col("id").alias("vec_id"), "embedding"
    )
    cents, cb = ann.train_ivfpq(emb, n_lists=n_lists, m=m, k_codes=k_codes)
    codes = ann.ivfpq_encode(emb, cents, cb)
    cents_df, cb_df = ann.ivfpq_model_tables(spark, cents, cb)
    return {
        "chunks": chunks,
        "emb": emb,
        "codes": codes,
        "cents": cents,
        "cb": cb,
        "cents_df": cents_df,
        "cb_df": cb_df,
        "obs": obs,
    }


def index_manifest(codes: DataFrame, version: str = "rix-1") -> DataFrame:
    """(list_id, n_codes, version) — the per-inverted-list manifest. The
    audit contract: ``sum(n_codes)`` must equal the chunk count observed
    at build time — every chunk embeds to exactly one list; a mismatch
    means vectors were dropped between chunking and encode."""
    return codes.groupBy("list_id").agg(
        F.count("*").alias("n_codes"), F.lit(version).alias("version")
    )


def query_retrieval_index(
    index: dict,
    queries: DataFrame,
    n_probe: int = 4,
    shortlist: int = 50,
    k: int = 10,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The deployment query path over a built index: (luts, biases,
    refined top-k). ``queries`` is (vec_id, embedding); the returned
    frames let a caller stage luts/biases for oracle replay before
    executing the refine."""
    luts, biases = ann.ivfpq_query_tables(
        queries, index["cents"], index["cb"], n_probe=n_probe
    )
    short = ann.ivfpq_adc_topk(index["codes"], luts, biases, k=shortlist).select(
        "query_id", "item_id"
    )
    topk = ann.ivfpq_refined_topk(
        short, index["codes"], index["cents_df"], index["cb_df"], queries, k=k
    )
    return luts, biases, topk


def run_retrieval_index_job(
    spark: SparkSession,
    docs: DataFrame,
    output: str | None = None,
    budget_tokens: int = 40,
    n_lists: int = 8,
    m: int = 8,
    k_codes: int = 16,
    n_probe: int = 4,
    k: int = 10,
    query_doc_limit: int = 4,
) -> dict:
    """End-to-end job with the audit: build, manifest, self-query (the
    chunks of the first ``query_doc_limit`` docs as probes), and the
    manifest-vs-observed reconciliation. Returns
    ``{"metrics", "manifest_rows", "topk"}``; writes the index tables
    under ``output`` when given."""
    index = build_retrieval_index(
        docs, budget_tokens=budget_tokens, n_lists=n_lists, m=m, k_codes=k_codes
    )
    # one action fills the observe metrics and materializes the encode
    codes = index["codes"].localCheckpoint()
    manifest = index_manifest(codes)
    manifest_rows = manifest.collect()
    n_indexed = sum(r["n_codes"] for r in manifest_rows)
    observed = dict(index["obs"].get)
    queries = index["emb"].where(
        F.col("vec_id") < query_doc_limit * UID_STRIDE
    )
    _, _, topk = query_retrieval_index(
        {**index, "codes": codes}, queries, n_probe=n_probe, k=k
    )
    if output:
        codes.write.mode("overwrite").parquet(f"{output}/codes")
        index["cents_df"].write.mode("overwrite").parquet(f"{output}/cents")
        index["cb_df"].write.mode("overwrite").parquet(f"{output}/codebooks")
        manifest.write.mode("overwrite").parquet(f"{output}/manifest")
    # audit: every observed chunk landed in exactly one inverted list
    audit_ok = n_indexed == observed["n_chunks"]
    return {
        "metrics": {
            **observed,
            "n_indexed": n_indexed,
            "n_lists": len(manifest_rows),
            "audit_ok": audit_ok,
        },
        "manifest_rows": manifest_rows,
        "topk": topk,
    }
