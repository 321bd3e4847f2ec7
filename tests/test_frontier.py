"""Crawl frontier + politeness scheduler (operators/frontier.py):
frontier semantics, per-wave politeness invariants, cap plan shape."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from ocr_platform_spark.operators.frontier import (
    build_frontier,
    fetch_schedule,
    schedule_stats,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(src_url=s, dst_url=d) for s, d in pairs]
    )


def _urls(spark, urls):
    return spark.createDataFrame([Row(url=u) for u in urls])


def test_frontier_excludes_crawled_and_counts_distinct_referrers(spark):
    edges = _edges(
        spark,
        [
            ("https://a.org/1", "https://b.org/x"),
            ("https://a.org/1", "https://b.org/x"),  # same referrer twice
            ("https://a.org/2", "https://b.org/x"),
            ("https://a.org/1", "https://a.org/2"),  # already crawled
            ("https://a.org/2", "https://c.org/y"),
        ],
    )
    crawled = _urls(spark, ["https://a.org/1", "https://a.org/2"])
    rows = {r["url"]: r for r in build_frontier(edges, crawled).collect()}
    assert set(rows) == {"https://b.org/x", "https://c.org/y"}
    assert rows["https://b.org/x"]["n_referrers"] == 2
    assert rows["https://b.org/x"]["host"] == "b.org"
    assert rows["https://c.org/y"]["n_referrers"] == 1


def test_schedule_politeness_invariants(spark):
    # 7 urls on one host, 1 on another; per_wave=2 → host h has waves
    # 0,0,1,1,2,2,3 and no wave carries >2 urls of one host
    frontier = spark.createDataFrame(
        [Row(url=f"https://h.org/{i}", host="h.org", n_referrers=10 - i) for i in range(7)]
        + [Row(url="https://k.org/0", host="k.org", n_referrers=1)]
    )
    sched = fetch_schedule(frontier, per_wave=2).collect()
    per_host_wave: dict[tuple[str, int], int] = {}
    for r in sched:
        per_host_wave[(r["host"], r["wave"])] = per_host_wave.get((r["host"], r["wave"]), 0) + 1
        assert 0 <= r["slot"] < 2
    assert max(per_host_wave.values()) <= 2
    # priority order: higher referrer count fetches in an earlier-or-equal wave
    h = sorted((r for r in sched if r["host"] == "h.org"), key=lambda r: -r["n_referrers"])
    waves = [r["wave"] for r in h]
    assert waves == sorted(waves)
    assert [r["wave"] for r in sched if r["host"] == "k.org"] == [0]


def test_max_waves_truncates(spark):
    frontier = spark.createDataFrame(
        [Row(url=f"https://h.org/{i}", host="h.org", n_referrers=1) for i in range(10)]
    )
    sched = fetch_schedule(frontier, per_wave=2, max_waves=3)
    assert sched.count() == 6
    assert sched.agg(F.max("wave")).first()[0] == 2
    stats = schedule_stats(sched).collect()
    assert [(r["wave"], r["n_urls"]) for r in stats] == [(0, 2), (1, 2), (2, 2)]


def test_cap_plan_uses_window_group_limit(spark):
    """The max_waves cap must run as a partial top-k before the host
    shuffle (WindowGroupLimit), not as a post-window filter — the property
    that bounds a hot host's sort at the cap at 10^12 edges."""
    frontier = spark.createDataFrame(
        [Row(url=f"https://h.org/{i}", host="h.org", n_referrers=1) for i in range(4)]
    )
    plan = fetch_schedule(frontier, per_wave=2, max_waves=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_schedule_deterministic_across_parallelism(spark):
    frontier = spark.createDataFrame(
        [
            Row(url=f"https://h{i % 5}.org/p{i}", host=f"h{i % 5}.org", n_referrers=i % 3)
            for i in range(40)
        ]
    )
    a = sorted(map(tuple, fetch_schedule(frontier.repartition(1), 2, 4).collect()))
    b = sorted(map(tuple, fetch_schedule(frontier.repartition(13), 2, 4).collect()))
    assert a == b
