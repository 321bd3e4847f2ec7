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


def _star_group_lines(
    robots: DataFrame, host_col: str = "host", text_col: str = "text"
) -> DataFrame:
    """(host, pos, field, value) for every line inside a ``*``-agent group
    — the shared front half of :func:`robots_rules` / :func:`crawl_delays`."""
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
    return grouped.join(star, ["host", "g"]).select("host", "pos", "field", "value")


def robots_rules(robots: DataFrame, host_col: str = "host", text_col: str = "text") -> DataFrame:
    """(host, rule ∈ {allow, disallow}, prefix, plen) — the ``*``-agent
    prefix rules of each host's robots.txt, parsed relationally per the
    module contract."""
    return (
        _star_group_lines(robots, host_col, text_col)
        .where(F.col("field").isin("allow", "disallow") & (F.col("value") != ""))
        .select(
            "host",
            F.col("field").alias("rule"),
            F.col("value").alias("prefix"),
            F.length("value").cast("int").alias("plen"),
        )
    )


# Strict digit-run gate for Crawl-delay values. A plain try_cast would
# DRIFT cross-engine on fractional values (Spark truncates '1.5'→1, DuckDB
# rounds '1.5'→2); the regex admits only whole non-negative seconds ≤9
# digits (no int overflow) and is shared verbatim with the oracle.
_DELAY_RE = "^[0-9]{1,9}$"


def crawl_delays(
    robots: DataFrame, host_col: str = "host", text_col: str = "text"
) -> DataFrame:
    """(host, delay_s) — the ``*``-agent Crawl-delay, integer seconds.
    Values that are not a plain digit run are ignored (fractional-second
    delays are out of contract — see ``_DELAY_RE``); multiple valid lines
    take the MINIMUM, breaking ties toward politeness deterministically."""
    g = _star_group_lines(robots, host_col, text_col)
    return (
        g.where((F.col("field") == "crawl-delay") & F.col("value").rlike(_DELAY_RE))
        .groupBy("host")
        .agg(F.min(F.col("value").cast("int")).cast("int").alias("delay_s"))
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


def _oracle_front_cte(robots_glob: str, frontier_glob: str) -> str:
    """Shared CTE chain (raw text → star-group lines → prefix rules →
    per-url longest-prefix lengths) — the DuckDB twin of
    ``_star_group_lines`` / ``robots_rules`` / the match half of
    ``robots_decisions``, kept next to the operators so the parses cannot
    drift silently. Callers append their own tail after this ``WITH``."""
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
    star_lines AS (
      SELECT r.host, r.pos, r.field, r.value
      FROM grp r JOIN star s ON r.host = s.host AND r.g = s.g
    ),
    rules AS (
      SELECT host, field AS rule, value AS prefix,
             CAST(length(value) AS INT) AS plen
      FROM star_lines
      WHERE field IN ('allow', 'disallow') AND value <> ''
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
    )"""


def robots_oracle_sql(robots_glob: str, frontier_glob: str) -> str:
    """The DuckDB twin of robots_rules ∘ robots_decisions, from the same
    staged raw text — a full cross-engine replay of the parse."""
    return f"""
    {_oracle_front_cte(robots_glob, frontier_glob)}
    SELECT f.url, f.host, f.path, m.allow_len, m.dis_len,
           COALESCE(m.dis_len, -1) <= COALESCE(m.allow_len, -1) AS allowed
    FROM f LEFT JOIN m ON f.url = m.url
    ORDER BY f.url
    """


def crawl_delay_schedule_oracle_sql(robots_glob: str, frontier_glob: str) -> str:
    """DuckDB twin of crawl_delays ∘ robots_decisions ∘ the per-host
    schedule rollup (see queries.crawl_delay_schedule) — same staged raw
    text, same strict digit gate as ``_DELAY_RE``."""
    return f"""
    {_oracle_front_cte(robots_glob, frontier_glob)},
    delays AS (
      SELECT host, CAST(MIN(CAST(value AS INT)) AS INT) AS delay_s
      FROM star_lines
      WHERE field = 'crawl-delay' AND regexp_matches(value, '^[0-9]{{1,9}}$')
      GROUP BY host
    ),
    allowed AS (
      SELECT f.host
      FROM f LEFT JOIN m ON f.url = m.url
      WHERE COALESCE(m.dis_len, -1) <= COALESCE(m.allow_len, -1)
    ),
    agg AS (SELECT host, COUNT(*) AS n_allowed FROM allowed GROUP BY host)
    SELECT a.host,
           CAST(COALESCE(d.delay_s, 1) AS INT) AS delay_s,
           a.n_allowed,
           CAST(COALESCE(d.delay_s, 1) * (a.n_allowed - 1) AS BIGINT) AS est_crawl_s
    FROM agg a LEFT JOIN delays d ON a.host = d.host
    ORDER BY a.host
    """
