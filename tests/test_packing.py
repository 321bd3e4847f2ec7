"""Sequence packing (operators/packing.py): greedy recurrence semantics,
budget invariants, shard independence."""

from pyspark.sql import functions as F

from ocr_platform_spark.operators.packing import pack_sequences, sequence_rollup


def _serial_pack(weights, budget):
    seq, fill, out = 1, 0, []
    for w in weights:
        if fill > 0 and fill + w > budget:
            seq += 1
            fill = 0
        fill += w
        out.append((seq, fill))
    return out


def test_pack_matches_serial_rule_per_shard(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 900 + 100) for i in range(200)], "doc_id long, w long"
    )
    packed = pack_sequences(df, "doc_id", "w", budget=2000, n_shards=4).collect()
    by_shard: dict = {}
    for r in sorted(packed, key=lambda r: (r["shard_id"], r["doc_id"])):
        by_shard.setdefault(r["shard_id"], []).append(r)
    weights = {r["doc_id"]: (r["doc_id"] * 37) % 900 + 100 for r in packed}
    assert sum(len(v) for v in by_shard.values()) == 200
    for rows in by_shard.values():
        expect = _serial_pack([weights[r["doc_id"]] for r in rows], 2000)
        got = [(r["seq_id"], r["fill_after"]) for r in rows]
        assert got == expect


def test_pack_budget_and_oversize_invariants(spark):
    df = spark.createDataFrame(
        [(1, 500), (2, 700), (3, 5000), (4, 900), (5, 100)], "doc_id long, w long"
    )
    packed = pack_sequences(df, "doc_id", "w", budget=1000, n_shards=1)
    roll = {
        r["seq_id"]: (r["n_docs"], r["seq_weight"])
        for r in sequence_rollup(packed).collect()
    }
    # every sequence within budget EXCEPT singleton oversize docs
    rows = packed.collect()
    for seq_id, (n_docs, wsum) in roll.items():
        if wsum > 1000:
            assert n_docs == 1  # the 5000-weight doc sits alone
    # no document lost or duplicated
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3, 4, 5]
    # fill_after is a per-sequence running total ending at the rollup weight
    last = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        last[(r["shard_id"], r["seq_id"])] = r["fill_after"]
    for (sid, qid), fill in last.items():
        assert roll[qid][1] == fill


def test_pack_is_deterministic_across_partitioning(spark):
    df = spark.createDataFrame(
        [(i, (i * 13) % 400 + 50) for i in range(100)], "doc_id long, w long"
    )
    a = sorted(map(tuple, pack_sequences(df, "doc_id", "w", 1500, 4).collect()))
    b = sorted(
        map(tuple, pack_sequences(df.repartition(7), "doc_id", "w", 1500, 4).collect())
    )
    assert a == b


def test_pack_sequences_string_ids(spark):
    """The id column keeps its source type — string keys (the dedup-family
    id shape) must pack, not crash Arrow conversion on a hardcoded long."""
    from ocr_platform_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(f"url-{i:03d}", 40) for i in range(30)], "u string, n long"
    )
    out = pack_sequences(df, "u", "n", budget=100, n_shards=4).collect()
    assert len(out) == 30
    assert all(isinstance(r["doc_id"], str) for r in out)
    assert all(r["fill_after"] <= 100 for r in out)


def test_pack_blocks_encoded_stream_semantics(spark):
    """Fixed-block packing: the concatenation of all blocks' ids in
    block order equals the concatenation of all docs' ids in doc order;
    every block holds exactly seq_len tokens except the last; doc
    boundaries are crossed (a doc longer than seq_len spans blocks);
    bucket_span smaller than the id range exercises the two-level path."""
    from ocr_platform_spark.operators.packing import pack_blocks_encoded

    enc = spark.createDataFrame(
        [
            (10, 3, "1 2 3"),
            (500, 5, "4 5 6 7 8"),
            (2000, 2, "9 10"),
            (5000, 7, "11 12 13 14 15 16 17"),
        ],
        "doc_id long, n_tokens long, ids string",
    )
    rows = sorted(
        pack_blocks_encoded(enc, seq_len=4, id_col="doc_id", bucket_span=1024)
        .collect(),
        key=lambda r: r["block_id"],
    )
    assert [r["block_id"] for r in rows] == [0, 1, 2, 3, 4]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 4, 1]
    stream = " ".join(r["ids"] for r in rows)
    assert stream == " ".join(str(i) for i in range(1, 18))
    # doc 500's tokens (4..8) straddle blocks 0 and 1
    assert rows[0]["ids"].endswith("4") and rows[1]["ids"].startswith("5")


def test_pack_blocks_encoded_with_separator(spark):
    """sep_id appends the EOS id after every doc before packing: the
    stream interleaves separators at doc boundaries and the final block
    ends in the separator."""
    from ocr_platform_spark.operators.packing import pack_blocks_encoded

    enc = spark.createDataFrame(
        [(1, 2, "7 8"), (2, 3, "9 10 11")],
        "doc_id long, n_tokens long, ids string",
    )
    rows = sorted(
        pack_blocks_encoded(enc, seq_len=3, id_col="doc_id", sep_id=0).collect(),
        key=lambda r: r["block_id"],
    )
    stream = " ".join(r["ids"] for r in rows)
    assert stream == "7 8 0 9 10 11 0"
    assert [r["n_tokens"] for r in rows] == [3, 3, 1]
