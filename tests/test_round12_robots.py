"""Round 12: robots.txt parsing + retrospective allow/disallow
verdicts (RFC 9309 semantics — the crawl-compliance member of the
front-door family).

Pinned here: group structure (shared User-agent lines, groups split
by rules-then-UA, unknown directives ignored), most-specific-agent
selection (* loses to any named match), longest-match rule precedence
with Allow winning ties, wildcard * and $ anchor compilation, empty
Disallow as allow-all, default-allow for unruled hosts, and the
duplicate-row-preserving verdict join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggo_spark.operators import robots as R

ROBOTS_A = """
# comments and blanks are ignored
User-agent: googlebot
User-agent: aggo-crawler
Disallow: /private/
Allow: /private/press*.html$
Crawl-delay: 5

User-agent: *
Disallow: /tmp/
Disallow: /*.json$
Allow:
"""

ROBOTS_B = "User-agent: *\nDisallow: /\nAllow: /pub"


@pytest.fixture(scope="module")
def rules(spark):
    df = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        "host string, robots_txt string")
    return R.parse_robots(df).cache()


def _verdicts(spark, rules, agent):
    urls = spark.createDataFrame([
        (1, "https://a.com/private/report.html"),
        (2, "https://a.com/private/press1.html"),
        (3, "https://a.com/tmp/x"),
        (4, "https://a.com/data.json"),
        (5, "https://b.com/secret"),
        (6, "https://b.com/pub/file"),
        (7, "https://nohost.com/x"),
        (8, "https://a.com/"),
    ], "doc_id long, url string")
    out = R.robots_verdict(urls, rules, user_agent=agent)
    return {r["doc_id"]: r["robots_allowed"] for r in out.collect()}


class TestParse:
    def test_rules_table(self, spark, rules):
        rows = {(r["host"], r["agent"], r["allow"], r["path"])
                for r in rules.collect()}
        assert ("a.com", "aggo-crawler", False, "/private/") in rows
        assert ("a.com", "googlebot", False, "/private/") in rows
        assert ("a.com", "aggo-crawler", True,
                "/private/press*.html$") in rows
        assert ("a.com", "*", False, "/*.json$") in rows
        # empty Disallow parses as a length-0 allow-all
        assert ("a.com", "*", True, "") in rows
        assert ("b.com", "*", True, "/pub") in rows

    def test_regex_compilation(self, spark, rules):
        rx = {r["path"]: r["rx"] for r in rules.collect()}
        assert rx["/private/press*.html$"] == r"^/private/press.*\.html$"
        assert rx["/private/"] == "^/private/.*$"
        assert rx["/*.json$"] == r"^/.*\.json$"

    def test_unruled_corpus_is_empty(self, spark):
        df = spark.createDataFrame(
            [("c.com", "# nothing here\nSitemap: /s.xml")],
            "host string, robots_txt string")
        assert R.parse_robots(df).count() == 0


class TestVerdict:
    def test_named_agent_group_wins(self, spark, rules):
        got = _verdicts(spark, rules, "aggo-crawler")
        assert got == {
            1: False,  # Disallow /private/
            2: True,   # longer Allow /private/press*.html$ wins
            3: True,   # the * group's /tmp/ does NOT apply to aggo
            4: True,   # nor /*.json$
            5: False,  # b.com Disallow /
            6: True,   # Allow /pub is longer than Disallow /
            7: True,   # no rules for the host -> default allow
            8: True,
        }

    def test_star_agent(self, spark, rules):
        got = _verdicts(spark, rules, "randombot")
        assert got == {1: True, 2: True, 3: False, 4: False,
                       5: False, 6: True, 7: True, 8: True}

    def test_duplicate_rows_each_keep_a_verdict(self, spark, rules):
        urls = spark.createDataFrame(
            [(1, "https://b.com/secret")] * 3,
            "doc_id long, url string")
        out = R.robots_verdict(urls, rules).collect()
        assert len(out) == 3
        assert all(r["robots_allowed"] is False for r in out)

    def test_filter(self, spark, rules):
        urls = spark.createDataFrame(
            [(5, "https://b.com/secret"), (6, "https://b.com/pub/x")],
            "doc_id long, url string")
        kept = R.robots_filter(urls, rules)
        assert [r["doc_id"] for r in kept.collect()] == [6]
        assert kept.columns == ["doc_id", "url"]

    def test_malformed_urls_default_allow(self, spark, rules):
        urls = spark.createDataFrame(
            [(1, "not a url"), (2, None)], "doc_id long, url string")
        got = {r["doc_id"]: r["robots_allowed"]
               for r in R.robots_verdict(urls, rules).collect()}
        assert got == {1: True, 2: True}

    def test_plan_is_broadcast_join(self, spark, rules):
        urls = spark.createDataFrame(
            [(1, "https://a.com/x")], "doc_id long, url string")
        plan = R.robots_verdict(urls, rules)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan

    def test_plan_has_no_corpus_window(self, spark, rules):
        """r12 advisory: the verdict must not shuffle the page corpus.
        Every Window/Exchange in the plan must live UNDER the
        BroadcastExchange (the tiny rules side); the corpus side —
        everything printed before the BroadcastExchange line — stays
        scan → project → broadcast-join, with no Window, no Exchange,
        and no per-row id."""
        urls = spark.createDataFrame(
            [(1, "https://a.com/x")], "doc_id long, url string")
        plan = R.robots_verdict(urls, rules)._jdf.queryExecution() \
            .executedPlan().toString()
        corpus_side = plan.split("BroadcastExchange")[0]
        assert "Window" not in corpus_side
        assert "Exchange" not in corpus_side
        assert "monotonically_increasing_id" not in plan
        assert "BroadcastHashJoin" in corpus_side

    def test_query_string_rules_fire(self, spark):
        """RFC 9309 practice (r12 ADVICE): patterns like
        /*?sessionid= match against path+query, not path alone."""
        rules = R.parse_robots(spark.createDataFrame(
            [("q.com", "User-agent: *\nDisallow: /*?sessionid="),
             ("r.com", "User-agent: *\nDisallow: /*sessionid=")],
            "host string, robots_txt string"))
        urls = spark.createDataFrame([
            (1, "https://q.com/page?sessionid=abc"),
            (2, "https://q.com/page"),
            # literal '?' in the pattern does NOT match '&sessionid='
            (3, "https://q.com/page?x=1&sessionid=2"),
            # the un-anchored form matches it anywhere in path+query
            (4, "https://r.com/page?x=1&sessionid=2"),
            (5, "https://r.com/page?x=1"),
        ], "doc_id long, url string")
        got = {r["doc_id"]: r["robots_allowed"]
               for r in R.robots_verdict(urls, rules).collect()}
        assert got == {1: False, 2: True, 3: True, 4: False, 5: True}

    def test_user_columns_named_host_path_allow(self, spark, rules):
        """r12 ADVICE medium: crawl frames routinely carry host/path/
        allow columns; the verdict must not collide with them (all
        internals are __r_-prefixed)."""
        urls = spark.createDataFrame([
            (1, "https://b.com/secret", "b.com", "/secret", True),
            (2, "https://b.com/pub/x", "b.com", "/pub/x", False),
        ], "doc_id long, url string, host string, path string,"
           " allow boolean")
        out = R.robots_verdict(urls, rules)
        assert out.columns == ["doc_id", "url", "host", "path",
                               "allow", "robots_allowed"]
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows[1]["robots_allowed"] is False
        assert rows[2]["robots_allowed"] is True
        assert rows[1]["host"] == "b.com" and rows[1]["allow"] is True
