"""Versioned external-dimension snapshots — the ERP source (SURVEY.md S7).

The reference pulls dimension data (companies, ledgers, stock items, units)
from an external ERP on demand: each request re-fetches the current list
over XML/HTTP (``ocr_backend/app/tally/data_retrieval.py:17-315``) and the
option tables carry an ``updated_at`` freshness stamp consumed by the
auto-refresh check (``app/tally/tally_field_options.py:820-860``).

A distributed engine must not call an external system from executors (every
task would hammer the ERP, and results would differ between tasks). The
Spark-first shape is a *dimension snapshot store*:

- a driver-side connector pulls the dimension ONCE per sync and commits the
  full result as an immutable version (atomic temp+rename manifest, the
  same commit protocol as operators/resume.py);
- queries read one committed version — ``latest()`` for the reference's
  always-refetch behavior, ``as_of(ts)`` for reproducible historical runs
  (a re-run of yesterday's job joins yesterday's dimension, not today's);
- the tiny version table then enters joins via ``broadcast()`` (J1/J7).

Each version is a FULL replacement (the reference refetches the whole list,
not a delta), so a read never unions versions — it picks exactly one.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

_MANIFEST = "_COMMITTED"


def _to_unix(ts: datetime | int | float | None) -> int:
    if ts is None:
        return int(time.time())
    if isinstance(ts, datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        return int(ts.timestamp())
    return int(ts)


class DimensionStore:
    """Full-snapshot versioned dimension with as-of reads."""

    def __init__(self, path: str) -> None:
        self.path = path
        self.version_root = os.path.join(path, "versions")

    # -- write side ----------------------------------------------------------

    def sync(
        self, dim: DataFrame, run_id: str, effective_ts: datetime | int | None = None
    ) -> dict:
        """Commit one full dimension pull as an immutable version.

        Idempotent on ``run_id`` (a retried sync can't duplicate or clobber
        a committed version); a crashed sync leaves an uncommitted directory
        readers never see. ``effective_ts`` is the business time the pull
        represents (defaults to now) — ``as_of`` selects on it."""
        vdir = os.path.join(self.version_root, run_id)
        marker = os.path.join(vdir, _MANIFEST)
        if os.path.exists(marker):
            with open(marker) as f:
                return json.load(f)
        dim.write.mode("overwrite").parquet(os.path.join(vdir, "data"))
        manifest = {
            "run_id": run_id,
            "effective_unix": _to_unix(effective_ts),
            "n_rows": None,  # dimensions are tiny; count is cheap but optional
        }
        tmp = os.path.join(vdir, f".{_MANIFEST}.tmp")
        os.makedirs(vdir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, marker)  # the commit point
        return manifest

    # -- read side -----------------------------------------------------------

    def versions(self) -> list[dict]:
        """Committed versions, ordered by (effective_unix, run_id)."""
        if not os.path.isdir(self.version_root):
            return []
        out = []
        for d in os.listdir(self.version_root):
            marker = os.path.join(self.version_root, d, _MANIFEST)
            if os.path.exists(marker):
                with open(marker) as f:
                    m = json.load(f)
                m["data_dir"] = os.path.join(self.version_root, d, "data")
                out.append(m)
        return sorted(out, key=lambda m: (m["effective_unix"], m["run_id"]))

    def _read(self, spark: SparkSession, version: dict | None) -> DataFrame | None:
        if version is None:
            return None
        return spark.read.parquet(version["data_dir"])

    def latest(self, spark: SparkSession) -> DataFrame | None:
        """The newest committed version — the reference's refetch-per-request
        behavior, minus the per-request external call."""
        vs = self.versions()
        return self._read(spark, vs[-1] if vs else None)

    def as_of(self, spark: SparkSession, ts: datetime | int) -> DataFrame | None:
        """The version in effect at ``ts``: newest effective_unix ≤ ts.
        Re-running a historical job with the same ``ts`` joins the same
        dimension rows regardless of later syncs."""
        cut = _to_unix(ts)
        vs = [m for m in self.versions() if m["effective_unix"] <= cut]
        return self._read(spark, vs[-1] if vs else None)


def normalized_dim_lookup(
    facts: DataFrame,
    dim: DataFrame,
    probe_col: str,
    name_col: str = "name",
    alias_col: str | None = None,
    how: str = "left",
) -> DataFrame:
    """Case-insensitive name(-or-alias) dimension lookup (J7): broadcast the
    dimension; equality on ``lower(trim(x))``, OR'd with the alias column
    when one exists. The OR-of-equalities predicate has no hash-join form —
    with a broadcast dimension Catalyst plans BroadcastNestedLoopJoin, the
    right physical join for a tiny dim at any fact scale
    (``app/tally/data_retrieval.py:184-217``)."""
    norm = lambda c: F.lower(F.trim(c))  # noqa: E731
    cond = norm(facts[probe_col]) == norm(dim[name_col])
    if alias_col is not None:
        cond = cond | (norm(facts[probe_col]) == norm(dim[alias_col]))
    return facts.join(F.broadcast(dim), cond, how)
