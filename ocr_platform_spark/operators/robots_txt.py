"""robots.txt parsing + frontier filtering — the host-level politeness gate.

kernels/robots.py handles the PAGE-level opt-out (``<meta name="robots">``,
present in the payload itself); this module is the HOST-level gate a crawl
frontier applies before a URL is ever fetched. Parsing is implemented as
PURE relational operations (split → explode → window-grouped sections →
prefix rules), not a Python kernel, so the catalog oracle replays the
entire parse AND the allow/disallow decision from the staged raw
robots.txt text — a full cross-engine proof with no staged intermediate
trust boundary.

Contract (original REP + RFC 9309 ordering, scoped like the meta kernel):

- lines split on LF, CR stripped, ``#`` comments removed, fields matched
  case-insensitively (``field : value``, value = rest after the FIRST
  colon, trimmed);
- a group = consecutive ``User-agent`` lines followed by its rules; only
  groups whose agent set contains ``*`` apply (this engine is not a
  specific crawler — same stance as kernels/robots.py ignoring
  bot-specific metas);
- ``Allow`` / ``Disallow`` values are PATH PREFIXES matched literally
  (``*``/``$`` wildcard syntax is out of contract and matches itself;
  the 1994 REP behavior). Empty values carry no rule ("Disallow:" ≡
  allow-everything);
- decision per URL path: longest matching prefix wins across both rule
  kinds; a tie (and no match at all) is ALLOW — RFC 9309 §2.2.2.

Scale shape: rules tables are host-dimension sized (one robots.txt per
host) — the rules side broadcasts; the frontier never reshuffles beyond
its existing host partitioning. The decision is one broadcast join +
one per-url aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Mirrored Spark/DuckDB regexes (Java regex ≡ RE2 for these patterns)
_FIELD_RE = r"^([A-Za-z-]+)[ \t]*:"
_VALUE_RE = r"^[A-Za-z-]+[ \t]*:(.*)$"
_PATH_RE = r"^https?://[^/]+(/.*)$"


def path_of(url_col: str | F.Column = "url") -> F.Column:
    """URL path incl. query ('' host-root → '/'), the REP match subject."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    p = F.regexp_extract(c, _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_rules(robots: DataFrame, host_col: str = "host", text_col: str = "text") -> DataFrame:
    """(host, rule ∈ {allow, disallow}, prefix, plen) — the ``*``-agent
    prefix rules of each host's robots.txt, parsed relationally per the
    module contract."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line0"),
    ).select(
        "host",
        "pos",
        F.trim(
            F.regexp_replace(F.regexp_replace("line0", "#.*", ""), "\r", "")
        ).alias("line"),
    )
    fields = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", _FIELD_RE, 1)).alias("field"),
        F.trim(F.regexp_extract("line", _VALUE_RE, 1)).alias("value"),
    )
    w = Window.partitionBy("host").orderBy("pos")
    grouped = (
        fields.withColumn("is_ua", F.col("field") == "user-agent")
        .withColumn(
            "newg",
            (
                F.col("is_ua")
                & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
            ).cast("int"),
        )
        .withColumn("g", F.sum("newg").over(w))
    )
    star = (
        grouped.where(F.col("is_ua") & (F.col("value") == "*"))
        .select("host", "g")
        .distinct()
    )
    return (
        grouped.join(star, ["host", "g"])
        .where(F.col("field").isin("allow", "disallow") & (F.col("value") != ""))
        .select(
            "host",
            F.col("field").alias("rule"),
            F.col("value").alias("prefix"),
            F.length("value").cast("int").alias("plen"),
        )
    )


def robots_decisions(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """(url, host, path, allow_len, dis_len, allowed) per frontier row —
    longest-prefix decision, allow on tie/no-match. ``rules`` broadcasts
    (host-dimension sized)."""
    f = frontier.select("url", "host", path_of("url").alias("path"))
    m = (
        f.join(F.broadcast(rules), "host")
        .where(F.col("path").startswith(F.col("prefix")))
        .groupBy("url")
        .agg(
            F.max(F.when(F.col("rule") == "allow", F.col("plen")))
            .cast("int")
            .alias("allow_len"),
            F.max(F.when(F.col("rule") == "disallow", F.col("plen")))
            .cast("int")
            .alias("dis_len"),
        )
    )
    return f.join(m, "url", "left").select(
        "url",
        "host",
        "path",
        "allow_len",
        "dis_len",
        (
            F.coalesce(F.col("dis_len"), F.lit(-1))
            <= F.coalesce(F.col("allow_len"), F.lit(-1))
        ).alias("allowed"),
    )


def apply_robots_txt(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Frontier rows whose URL the host's robots.txt permits — the filter
    a generate cycle applies between frontier build and fetch scheduling."""
    allowed = robots_decisions(frontier, rules).where(F.col("allowed")).select("url")
    return frontier.join(allowed, "url", "left_semi")


def robots_oracle_sql(robots_glob: str, frontier_glob: str) -> str:
    """The DuckDB twin of robots_rules ∘ robots_decisions, from the same
    staged raw text — kept next to the operators so the two parses cannot
    drift silently."""
    return f"""
    WITH robots AS (SELECT * FROM read_parquet('{robots_glob}')),
    split AS (SELECT host, string_split(text, chr(10)) AS ls FROM robots),
    lines AS (
      SELECT host, i AS pos,
             trim(replace(regexp_replace(ls[i], '#.*', ''), chr(13), '')) AS line
      FROM (SELECT host, ls, unnest(generate_series(1, len(ls))) AS i FROM split)
    ),
    fields AS (
      SELECT host, pos,
             lower(regexp_extract(line, '{_FIELD_RE}', 1)) AS field,
             trim(regexp_extract(line, '{_VALUE_RE}', 1)) AS value
      FROM lines
    ),
    flagged AS (
      SELECT *,
             (field = 'user-agent') AS is_ua,
             CASE WHEN field = 'user-agent'
                       AND NOT COALESCE(
                         lag(field = 'user-agent') OVER (PARTITION BY host ORDER BY pos),
                         FALSE)
                  THEN 1 ELSE 0 END AS newg
      FROM fields
    ),
    grp AS (
      SELECT *, SUM(newg) OVER (PARTITION BY host ORDER BY pos) AS g FROM flagged
    ),
    star AS (SELECT DISTINCT host, g FROM grp WHERE is_ua AND value = '*'),
    rules AS (
      SELECT r.host, r.field AS rule, r.value AS prefix,
             CAST(length(r.value) AS INT) AS plen
      FROM grp r JOIN star s ON r.host = s.host AND r.g = s.g
      WHERE r.field IN ('allow', 'disallow') AND r.value <> ''
    ),
    f AS (
      SELECT url, host,
             CASE WHEN regexp_extract(url, '{_PATH_RE}', 1) = '' THEN '/'
                  ELSE regexp_extract(url, '{_PATH_RE}', 1) END AS path
      FROM read_parquet('{frontier_glob}')
    ),
    m AS (
      SELECT f.url,
             CAST(MAX(CASE WHEN r.rule = 'allow' THEN r.plen END) AS INT) AS allow_len,
             CAST(MAX(CASE WHEN r.rule = 'disallow' THEN r.plen END) AS INT) AS dis_len
      FROM f JOIN rules r ON f.host = r.host AND starts_with(f.path, r.prefix)
      GROUP BY f.url
    )
    SELECT f.url, f.host, f.path, m.allow_len, m.dis_len,
           COALESCE(m.dis_len, -1) <= COALESCE(m.allow_len, -1) AS allowed
    FROM f LEFT JOIN m ON f.url = m.url
    ORDER BY f.url
    """
