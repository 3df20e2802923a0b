"""robots.txt parsing and retrospective allow/disallow verdicts.

Crawl-derived training corpora increasingly honor robots.txt
RETROSPECTIVELY: given the robots.txt captures a crawl snapshot
already holds (Common Crawl publishes a robotstxt dataset alongside
every crawl), drop documents whose host now disallows the fetching
agent. That is a pure relational problem — parse the (small) robots
corpus into a rules table once, then one host equi-join + regex match
+ longest-match window over the (huge) page corpus — so it belongs in
the engine next to the WARC front door.

Semantics follow RFC 9309 (the Google robots.txt spec):

- groups: one or more ``User-agent:`` lines followed by
  ``Allow``/``Disallow`` rules; a group's rules apply to every agent
  named above them; blank lines and comments (``#``) are ignored;
  unknown directives (Crawl-delay, Sitemap, ...) don't break groups.
- agent selection: the MOST SPECIFIC matching user-agent token wins
  (longest token that is a case-insensitive prefix-token of the
  product name; ``*`` matches any agent and loses to any named
  match). Only the winning group's rules apply.
- rule matching: path patterns match as prefixes with ``*`` wildcards
  and an optional ``$`` end anchor; the LONGEST matching pattern
  wins; on a tie between Allow and Disallow, Allow wins. No matching
  rule (or no group for the agent, or an empty Disallow) = allowed.

Everything is pure Column work: the parse is split/explode over the
robots text (one narrow Generate), patterns compile to anchored Java
regexes AT PARSE TIME (stored as a column, so the per-page match is a
single ``regexp_like``), and the verdict groups each host's (tiny)
rule set into ONE array row, broadcast-joins it, and picks the
longest match with ``F.filter`` + ``F.aggregate`` over the array —
zero exchange of the page corpus, no per-URL window, no fan-out join
(r12 verdict "what's wrong #1": the previous window-ranked form
shuffled the full corpus on a near-unique uid). At 100 TB the grouped
rules table is one row per host and broadcasts; the page corpus is
touched by exactly one codegen'd scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import _host_of

__all__ = [
    "parse_robots",
    "robots_verdict",
    "robots_filter",
]

# characters that are regex metachars but literal in robots patterns
_META = r"\.[]{}()+-?^|"


def _pattern_to_regex(pat: Column) -> Column:
    """Anchored Java regex for a robots path pattern: escape regex
    metachars, ``*`` → ``.*``, a trailing ``$`` stays an anchor; the
    match is a PREFIX match, so patterns without ``$`` get ``.*``
    appended and the whole thing is wrapped ``^...$`` (one regexp per
    rule row, compiled once at parse time)."""
    # escape metacharacters (backslash first)
    esc = F.regexp_replace(pat, r"([\\.\[\]{}()+\-?^|])", r"\\$1")
    # '$' only anchors at the END; an interior '$' is literal
    anchored = esc.endswith("$")
    body = F.when(anchored,
                  F.substring(esc, 1, F.length(esc) - 1)).otherwise(esc)
    body = F.regexp_replace(body, r"\$", r"\\$")   # interior $ literal
    body = F.regexp_replace(body, r"\*", ".*")
    return F.concat(F.lit("^"), body,
                    F.when(anchored, F.lit("$")).otherwise(F.lit(".*$")))


def parse_robots(
    df: DataFrame,
    text_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Parse a robots.txt corpus into a rules table: one row per
    (host, agent, rule) with ``allow`` (bool), ``path`` (the raw
    pattern), ``rx`` (the compiled anchored regex), ``pattern_len``
    (longest-match key), and ``agent_len`` (group-specificity key;
    ``*`` scores 0). Group structure follows RFC 9309: consecutive
    User-agent lines share the rule block below them; a User-agent
    line after rules starts a NEW group. Hosts whose file has no
    parseable rules produce no rows (= default allow)."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\r?\n"))
        .alias("line_no", "raw"),
    ).select(
        "host", "line_no",
        # strip comments + whitespace
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    parsed = lines.select(
        "host", "line_no",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1)))
        .alias("key"),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1))
        .alias("value"),
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))
    # group id: a user-agent line NOT preceded by another user-agent
    # line starts a new group (consecutive UA lines share the group)
    w = Window.partitionBy("host").orderBy("line_no")
    g = (parsed
         .withColumn("prev_key", F.lag("key").over(w))
         .withColumn(
             "new_group",
             ((F.col("key") == "user-agent")
              & (F.coalesce(F.col("prev_key"), F.lit(""))
                 != "user-agent")).cast("int"))
         .withColumn("group_id", F.sum("new_group").over(w)))
    agents = (g.filter(F.col("key") == "user-agent")
              .select("host", "group_id",
                      F.lower("value").alias("agent")))
    rules = (g.filter(F.col("key") != "user-agent")
             .filter(F.col("group_id") > 0)  # rules before any UA: ignored
             .select("host", "group_id", "line_no",
                     (F.col("key") == "allow").alias("allow"),
                     F.col("value").alias("path"))
             # an empty Disallow means "allow everything" — it carries
             # no restriction, and an empty pattern matches everything
             # at length 0, so keep it AS an allow-all rule of length 0
             .withColumn("allow",
                         F.when(F.col("path") == "", F.lit(True))
                         .otherwise(F.col("allow"))))
    out = (agents.join(rules, ["host", "group_id"])
           .select("host", "agent", "allow", "path",
                   F.length("path").alias("pattern_len"),
                   F.when(F.col("agent") == "*", F.lit(0))
                   .otherwise(F.length("agent")).alias("agent_len"),
                   _pattern_to_regex(F.col("path")).alias("rx")))
    return out


def robots_verdict(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    user_agent: str = "*",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Append ``robots_allowed`` to a URL frame by evaluating ``rules``
    (a :func:`parse_robots` table) for ``user_agent``:

    1. pick each host's MOST SPECIFIC agent group — the longest agent
       token that prefix-matches ``user_agent`` (case-insensitive),
       with ``*`` as the fallback; only that group's rules apply;
    2. among the group's rules whose pattern matches the URL's
       path (plus ``?query`` when present — real robots files target
       query strings, e.g. ``Disallow: /*?sessionid=``), the longest
       pattern wins; Allow wins ties; no match → allowed;
    3. hosts with no rules (or none for this agent) → allowed.

    Scale shape: the winning group's rules are collected into ONE
    array row per host (hosts' robots files are tiny, so the array is
    bounded), broadcast, and left-joined; the longest-match selection
    is a pure-Column ``filter``/``aggregate`` fold over that array —
    the page corpus is never shuffled, never fanned out, and needs no
    row id. Internal columns use the reserved ``__r_`` prefix so any
    user column set (including ``host``/``path``/``allow``) survives
    untouched."""
    ua = user_agent.lower()
    cand = rules.filter(
        (F.col("agent") == "*") | (F.lit(ua).startswith(F.col("agent"))))
    # most specific agent per host: keep only rows at the host's max
    # agent_len (ties collapse to the same group in real files; if two
    # distinct groups tie, their rules merge — the RFC's "combine
    # groups for the same matched agent" behavior). Window over the
    # rules table only — per-host-bounded and tiny.
    wa = Window.partitionBy("host")
    cand = (cand.withColumn("__max_agent", F.max("agent_len").over(wa))
            .filter(F.col("agent_len") == F.col("__max_agent")))
    grouped = cand.groupBy(F.col("host").alias("__r_host")).agg(
        F.collect_list(F.struct(
            F.col("pattern_len").alias("plen"),
            F.col("allow").alias("allow"),
            F.col("rx").alias("rx"))).alias("__r_rules"))
    if broadcast_rules:
        grouped = F.broadcast(grouped)
    path = F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")),
                      F.lit("/"))
    # empty path means "/" for matching purposes
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # rules match path+query (RFC 9309 practice: Google's parser and
    # patterns like "Disallow: /*?sessionid=" target the query string)
    query = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    target = F.when(query.isNotNull() & (query != ""),
                    F.concat(path, F.lit("?"), query)).otherwise(path)
    u = (urls
         .withColumn("__r_uhost", _host_of(F.col(url_col)))
         .withColumn("__r_target", target))
    joined = u.join(grouped, F.col("__r_uhost") == F.col("__r_host"),
                    "left")
    # rules whose compiled regex matches this URL; null target (bad
    # URL) or null rules (unruled host) fall through to default-allow
    hits = F.filter(
        F.col("__r_rules"),
        lambda r: F.regexp_like(F.col("__r_target"), r["rx"]))
    # fold: longest pattern wins, Allow wins ties; the (-1, true) seed
    # is the no-match default-allow verdict
    best = F.aggregate(
        hits,
        F.struct(F.lit(-1).alias("plen"), F.lit(True).alias("allow")),
        lambda acc, r: F.when(
            (r["plen"] > acc["plen"])
            | ((r["plen"] == acc["plen"]) & r["allow"]),
            F.struct(r["plen"].alias("plen"), r["allow"].alias("allow")),
        ).otherwise(acc))
    return joined.select(
        *urls.columns,
        F.coalesce(best["allow"], F.lit(True)).alias("robots_allowed"))


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    user_agent: str = "*",
) -> DataFrame:
    """Keep only URLs the rules allow for ``user_agent`` (the
    retrospective-compliance filter)."""
    out = robots_verdict(urls, rules, url_col=url_col,
                         user_agent=user_agent)
    return out.filter(F.col("robots_allowed")).drop("robots_allowed")
