"""spark-submit entry point for the composed retrieval-index build.

Usage (local sandbox):
    python tools/run_retrieval_index.py --input /path/corpus-parquet \\
        --output /path/index [--budget-tokens 40] [--n-lists 256] \\
        [--m 8] [--k-codes 256] [--n-probe 8] [--k 10]

Usage (cluster — the north rule's ship story):
    spark-submit --py-files ocr_platform_spark.zip tools/run_retrieval_index.py \\
        --input s3://bucket/corpus --output s3://bucket/index --master yarn

One job (plans/retrieval_index.run_retrieval_index_job): paragraph
chunking → deterministic trigram-hash embedding → IVF-PQ train/encode →
per-list manifest with the chunks==indexed audit → a self-query smoke of
the ADC-shortlist + index-only-refine path. Prints the run metrics as one
JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet dir")
    ap.add_argument("--output", default=None, help="index output dir")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--budget-tokens", type=int, default=40)
    ap.add_argument("--n-lists", type=int, default=8)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k-codes", type=int, default=16)
    ap.add_argument("--n-probe", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--query-doc-limit", type=int, default=4)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from ocr_platform_spark.plans.retrieval_index import run_retrieval_index_job
    from ocr_platform_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="retrieval-index")
    docs = spark.read.parquet(args.input).select(
        args.id_col, args.text_col
    )
    res = run_retrieval_index_job(
        spark,
        docs,
        output=args.output,
        budget_tokens=args.budget_tokens,
        n_lists=args.n_lists,
        m=args.m,
        k_codes=args.k_codes,
        n_probe=args.n_probe,
        k=args.k,
        query_doc_limit=args.query_doc_limit,
    )
    smoke = res["topk"].count()
    print(json.dumps({"metrics": res["metrics"], "topk_rows": smoke}))
    return 0 if res["metrics"]["audit_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
