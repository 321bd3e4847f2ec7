"""JSON-LD kernel (kernels/structdata.py): block discovery, RFC 8259
validity + root-object rule, @type string/array handling — and Python-json
≡ DuckDB-JSON parity on adversarial block bodies (the two-parser contract
the catalog oracle leans on)."""

from __future__ import annotations

import duckdb
import pytest

from ocr_platform_spark.kernels.structdata import (
    _LD_RE,
    blocks_sql_expr,
    ld_blocks,
    parse_block,
    sql_block_exprs,
    structured_data,
)


def _page(*bodies: str) -> bytes:
    scripts = "".join(
        f'<script type="application/ld+json">{b}</script>' for b in bodies
    )
    return f"<html><head>{scripts}</head><body><p>x</p></body></html>".encode()


def test_discovery_and_order():
    data = _page('{"@type":"Article"}', "[1,2]", '{"a":1')
    assert ld_blocks(data) == ['{"@type":"Article"}', "[1,2]", '{"a":1']
    recs = structured_data(data)
    assert [r["block_idx"] for r in recs] == [0, 1, 2]
    assert [r["is_valid"] for r in recs] == [True, False, False]


def test_non_html_payloads_have_no_blocks():
    assert ld_blocks(None) == []
    assert ld_blocks(b"") == []
    assert ld_blocks(b"%PDF-1.4 ...") == []


def test_type_rules():
    assert parse_block('{"@type":"Product","name":"x"}')["schema_type"] == "Product"
    assert parse_block('{"@type":["Organization","Brand"]}')["schema_type"] == "Organization"
    assert parse_block('{"@type":[1,2]}')["schema_type"] is None
    assert parse_block('{"@type":17}')["schema_type"] is None
    assert parse_block('{"name":"x"}')["schema_type"] is None
    assert parse_block('{"@type":"A","b":1,"c":2}')["n_keys"] == 3


def test_attribute_variants_match_contract():
    # extra attributes, either side of type=, case-insensitive tag
    raw = (
        '<SCRIPT async type="application/ld+json" id="x">{"a":1}</SCRIPT>'
        "<script type='application/ld+json'>{\"b\":1}</script>"  # single-quoted: out of contract
    )
    found = _LD_RE.findall(raw)
    assert found == ['{"a":1}']


ADVERSARIAL = [
    '{"@type":"Article","headline":"quote \\" inside","n":1}',
    '{"@type":"Article","u":"\\u00e9\\u4e2d"}',  # escaped non-ASCII
    '{"nested":{"@type":"Inner"},"@type":"Outer"}',
    '{"@type":["A"]}',
    '{"@type":[]}',
    "[1,2,3]",
    '"just a string"',
    "17",
    "true",
    "null",
    "",
    "   ",
    '{"a":1',  # truncated
    '{"a": 1e308, "b": -0.0, "c": 1234567890123456789}',
    '\n\t {"ws":"ok"} \n',
    '{"a":"trailing"}}',  # trailing garbage: invalid on both
    "{'a':1}",  # single quotes: invalid on both
]


@pytest.mark.parametrize("body", ADVERSARIAL)
def test_python_duckdb_parity(body):
    py = parse_block(body)
    e = sql_block_exprs("j")
    con = duckdb.connect()
    row = con.execute(
        f"""
        WITH f AS (SELECT TRY_CAST(? AS JSON) AS j0),
        g AS (SELECT CASE WHEN j0 IS NOT NULL AND json_type(j0) = 'OBJECT'
                          THEN j0 END AS j FROM f)
        SELECT {e["is_valid"]}, {e["schema_type"]}, {e["n_keys"]} FROM g
        """,
        [body],
    ).fetchone()
    assert row[0] == py["is_valid"]
    assert row[1] == py["schema_type"]
    assert row[2] == py["n_keys"]


def test_known_grammar_divergence_pinned():
    """The one out-of-contract grammar extension, pinned so an engine
    upgrade that closes (or widens) the gap is noticed: DuckDB's yyjson
    accepts trailing commas, CPython json does not. (NaN/Infinity, the
    usual suspect, is accepted by BOTH engines — also pinned.)"""
    import json
    import math

    con = duckdb.connect()
    assert con.execute("SELECT TRY_CAST('{\"a\":1,}' AS JSON) IS NOT NULL").fetchone()[0]
    assert parse_block('{"a":1,}')["is_valid"] is False
    assert math.isnan(json.loads("NaN"))
    assert con.execute(
        "SELECT json_type(TRY_CAST('{\"a\":NaN}' AS JSON))"
    ).fetchone()[0] == "OBJECT"
    assert parse_block('{"a":NaN}')["is_valid"] is True


def test_discovery_parity_duckdb():
    data = _page('{"@type":"Article"}', "[1,2]", '{"a":1')
    from ocr_platform_spark.kernels.html_extract import decode_html

    raw = decode_html(data)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {blocks_sql_expr('?::VARCHAR')}", [raw]
    ).fetchone()[0]
    assert got == ld_blocks(data)


def test_corpus_carries_blocks():
    # the synthetic corpus must exercise all branches: valid objects,
    # array @type, truncated-invalid blocks, and zero-block pages
    from ocr_platform_spark import corpus

    kinds = {"valid": 0, "invalid": 0, "none": 0, "array_type": 0}
    for i in range(400):
        d = corpus.gen_doc(i, corpus.DEFAULT_SEED)
        recs = structured_data(d["html"])
        if not recs:
            kinds["none"] += 1
        for r in recs:
            if r["is_valid"]:
                kinds["valid"] += 1
                if r["schema_type"] == "Organization":
                    kinds["array_type"] += 1
            else:
                kinds["invalid"] += 1
    assert all(v > 0 for v in kinds.values()), kinds
