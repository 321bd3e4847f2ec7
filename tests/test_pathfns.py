"""F18 filename/path hygiene semantics (werkzeug parity where the engines
can express it; catalog query `ingest_path_hygiene` carries the oracle)."""

from __future__ import annotations

from ocr_platform_spark.functions.pathfns import (
    has_traversal,
    path_within_base,
    secure_filename_col,
)


def _clean(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "f string")
    return [r[0] for r in df.select(secure_filename_col("f")).collect()]


def test_secure_filename_werkzeug_cases(spark):
    got = _clean(
        spark,
        [
            "My cool movie.mov",
            "../../../etc/passwd",
            "i contain cool \xfcml\xe4uts.txt",
            "  spaced   out .pdf ",
            "a/b\\c.txt",
            "__init__.py",
            "",
        ],
    )
    assert got[0] == "My_cool_movie.mov"
    assert got[1] == "etc_passwd"
    # werkzeug NFKD-transliterates umlauts; we drop non-ASCII (documented)
    assert got[2] == "i_contain_cool_mluts.txt"
    assert got[3] == "spaced_out_.pdf"
    assert got[4] == "a_b_c.txt"
    assert got[5] == "init__.py"  # leading underscores stripped, inner kept
    assert got[6] == ""


def test_traversal_and_containment(spark):
    rows = [
        ("uploads/a.pdf", True),
        ("../secret", False),
        ("a/../../b", False),
        ("a..b/c.txt", True),  # '..' inside a segment is not traversal
        ("/srv/data/x.pdf", True),
        ("/srv/database/x.pdf", False),  # prefix must end at a separator
        ("/etc/passwd", False),
        ("/srv/data", True),
    ]
    df = spark.createDataFrame([(p,) for p, _ in rows], "p string")
    got = [r[0] for r in df.select(path_within_base("p", "/srv/data")).collect()]
    assert got == [ok for _, ok in rows]
    trav = [r[0] for r in df.select(has_traversal("p")).collect()]
    assert trav == [False, True, True, False, False, False, False, False]
