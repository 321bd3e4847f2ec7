"""The north rule's ship story, actually shipped: run the extraction CLI
through a real ``spark-submit`` subprocess (own JVM/driver, not the test
session) and check commit metrics + resume semantics across invocations."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _submit(args: list[str]) -> dict:
    cmd = [
        shutil.which("spark-submit"),
        "--master", "local[4]",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        os.path.join(REPO, "tools", "run_extraction.py"),
        *args,
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, cwd=REPO
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the tool prints exactly one JSON object line on stdout
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-2000:]
    return json.loads(lines[-1])


def test_spark_submit_extraction_and_resume(spark, tmp_path):
    from ocr_platform_spark.operators.corpus_spark import documents_df

    docs = documents_df(spark, 150, golden=True)
    inp = str(tmp_path / "docs")
    docs.select("url", "warc_ts", "html", "text", "lang").write.parquet(inp)
    expected = {
        r["url"]: (r["expected_text"], r["expected_error"])
        for r in docs.select("url", "expected_text", "expected_error").collect()
    }

    table = str(tmp_path / "tbl")
    m1 = _submit(["--input", inp, "--table", table, "--run-id", "ship1"])
    assert m1["rows"] == 150 and m1["committed"]

    # committed text is byte-identical to the goldens (read back with the
    # test session - the snapshot is plain parquet + manifest)
    from ocr_platform_spark.operators.resume import SnapshotTable

    data = SnapshotTable(table).read_data(spark)
    got = {
        r["url"]: (r["text"], r["error"])
        for r in data.select("url", "text", "error").collect()
    }
    assert len(got) == 150
    for url, (text, err) in got.items():
        assert (text, err) == expected[url], url

    # second submit over the same input resumes: nothing new to extract
    m2 = _submit(["--input", inp, "--table", table, "--run-id", "ship2"])
    assert m2["rows"] == 0

    # grown input: only the delta is extracted
    more = documents_df(spark, 180, golden=True).where(
        ~F.col("url").isin(list(expected))
    )
    n_more = more.count()
    assert n_more == 30
    inp2 = str(tmp_path / "docs2")
    more.select("url", "warc_ts", "html", "text", "lang").write.parquet(inp2)
    m3 = _submit(["--input", inp2, "--table", table, "--run-id", "ship3"])
    assert m3["rows"] == 30
    assert SnapshotTable(table).read_data(spark).count() == 180
