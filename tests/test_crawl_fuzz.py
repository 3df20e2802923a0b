"""Property-based fuzz for the crawl tier.

The WARC parser consumes UNTRUSTED crawl bytes: the properties that
matter are (1) faithful round-trip of well-formed archives — including
payloads that embed ``\\r\\n\\r\\nWARC/1.0`` record-boundary look-alikes
(Content-Length framing must win over delimiter scanning) — and
(2) termination without exceptions on arbitrarily corrupted bytes.
Both run pure-Python (no Spark session), so hypothesis can afford
hundreds of examples.

strip_html gets a structured-generator property instead: tag soup built
from a known grammar must lose every tag and keep every text fragment
in order — run as ONE Spark job over the whole corpus of examples, not
one job per example.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

payloads = st.binary(min_size=0, max_size=300)
urls = st.from_regex(r"http://[a-z]{1,10}\.example/[a-z0-9]{0,8}",
                     fullmatch=True)


record_dicts = st.fixed_dictionaries(
    {"payload": payloads},
    optional={
        "url": urls,
        "http": st.booleans(),
        "warc_type": st.sampled_from(["response", "request", "conversion",
                                      "warcinfo", "metadata"]),
        "http_content_type": st.sampled_from(
            ["text/html", "text/plain; charset=utf-8", "image/png"]),
    },
)


class TestWarcFuzz:
    @given(recs=st.lists(record_dicts, min_size=1, max_size=8),
           gz=st.booleans())
    @settings(max_examples=150, deadline=None)
    def test_round_trip(self, recs, gz):
        from aggo_spark.sources.warc import encode_warc, parse_warc_bytes

        got = list(parse_warc_bytes(encode_warc(recs, gzip_members=gz)))
        assert len(got) == len(recs)
        for want, rec in zip(recs, got):
            assert rec["payload"] == want["payload"]
            assert rec["url"] == want.get("url")
            if want.get("http"):
                assert rec["http_status"] == 200
                assert rec["http_content_type"] == (
                    want.get("http_content_type", "text/html")
                    .partition(";")[0].strip().lower())

    @given(recs=st.lists(record_dicts, min_size=1, max_size=4),
           seed=st.integers(0, 2**32 - 1), gz=st.booleans())
    @settings(max_examples=150, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_corruption_terminates_without_raising(self, recs, seed, gz):
        from aggo_spark.sources.warc import encode_warc, parse_warc_bytes

        data = bytearray(encode_warc(recs, gzip_members=gz))
        rng = random.Random(seed)
        op = rng.randrange(3)
        if op == 0 and data:  # random byte flips
            for _ in range(rng.randint(1, 8)):
                data[rng.randrange(len(data))] = rng.randrange(256)
        elif op == 1:  # truncate anywhere
            del data[rng.randrange(len(data) + 1):]
        else:  # splice garbage into the middle
            at = rng.randrange(len(data) + 1)
            data[at:at] = bytes(rng.randrange(256) for _ in range(16))
        out = list(parse_warc_bytes(bytes(data)))
        # termination + sanity: never MORE records than the input held,
        # and whatever parsed carries the declared fields
        assert len(out) <= len(recs)
        for rec in out:
            assert isinstance(rec["payload"], (bytes, bytearray))

    @given(recs=st.lists(record_dicts, min_size=1, max_size=3))
    @settings(max_examples=50, deadline=None)
    def test_boundary_lookalike_payloads(self, recs):
        from aggo_spark.sources.warc import encode_warc, parse_warc_bytes

        # adversarial payloads embedding record-boundary look-alikes:
        # Content-Length framing must carry the parser straight past them
        for r in recs:
            r["payload"] = b"\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n" \
                + r["payload"]
        got = list(parse_warc_bytes(encode_warc(recs)))
        assert len(got) == len(recs)
        for want, rec in zip(recs, got):
            assert rec["payload"] == want["payload"]


# ---------------------------------------------------------------------------
# strip_html structured-soup property — one Spark job for the whole corpus
# ---------------------------------------------------------------------------

_TAGS = ["p", "div", "b", "i", "span", "li", "h2", "td"]
_CONTAINERS = ["script", "style", "noscript", "template"]


def _soup(rng: random.Random, depth: int = 0) -> tuple[str, list[str]]:
    """Random tag soup; returns (html, text fragments in order)."""
    html, frags = [], []
    for _ in range(rng.randint(1, 4)):
        kind = rng.randrange(4)
        if kind == 0 or depth >= 3:
            word = "w%d" % rng.randrange(10_000)
            html.append(word)
            frags.append(word)
        elif kind == 1:
            t = rng.choice(_TAGS)
            inner, inner_frags = _soup(rng, depth + 1)
            attrs = ' class="c%d"' % rng.randrange(9) if rng.random() < .4 else ""
            html.append(f"<{t}{attrs}>{inner}</{t}>")
            frags.extend(inner_frags)
        elif kind == 2:
            c = rng.choice(_CONTAINERS)
            html.append(f"<{c}>KILLME{rng.randrange(100)}</{c}>")
        else:
            html.append(f"<!-- GONE{rng.randrange(100)} -->")
    return " ".join(html), frags


def test_strip_html_soup_properties(spark):
    import re

    from pyspark.sql import functions as F

    from aggo_spark.operators.html import strip_html

    rng = random.Random(99)
    cases = [_soup(rng) for _ in range(200)]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, html string")
    got = {r.i: r.t for r in
           df.select("i", strip_html(F.col("html")).alias("t")).collect()}
    for i, (_, frags) in enumerate(cases):
        t = got[i]
        assert "KILLME" not in t and "GONE" not in t
        assert not re.search(r"</?[a-z]+[ >]", t)  # no surviving markup
        # every text fragment survives, in document order
        pos = 0
        for w in frags:
            nxt = t.find(w, pos)
            assert nxt >= 0, (i, w, t)
            pos = nxt + len(w)


def test_canonicalize_url_differential_vs_urllib(spark):
    """Pin the Column canonicalizer against a pure-Python urllib mirror
    over generated URLs (scheme/host case, ports, tracking params, param
    order, fragments, userinfo)."""
    import re as _re
    from urllib.parse import urlsplit

    from pyspark.sql import functions as F

    from aggo_spark.operators.text import TRACKING_PARAM_RE, canonicalize_url

    rng = random.Random(42)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    # incl. IDN forms (r8): punycode and Unicode hosts pin the documented
    # pass-through-lowercase behavior (no punycode conversion either way)
    hosts = ["Example.COM", "a.io", "WWW.site.org", "x-y.example",
             "XN--BCHER-KVA.example", "BÜcher.example"]
    ports = ["", ":80", ":443", ":8080"]
    # incl. percent-encoded forms (r8): unreserved decode (%41,%7e,%5F),
    # reserved kept but hex-uppercased (%2f,%3d), malformed passthrough
    paths = ["", "/", "/Path/To/X", "/a%2Fb", "/%41bc%7e", "/x%2f%5Fy",
             "/bad%2", "/pct%"]
    params = ["a=1", "b=2", "utm_source=t", "UTM_Medium=m", "gclid=g",
              "ref=main", "z=", "k=%41%2f", "t%65st=1", "%75tm_source=x"]
    frags = ["", "#sec"]

    def gen():
        q = rng.sample(params, rng.randint(0, 4))
        return (rng.choice(schemes) + "://" + rng.choice(hosts)
                + rng.choice(ports) + rng.choice(paths)
                + ("?" + "&".join(q) if q else "") + rng.choice(frags))

    def norm_pct(s):
        # the RFC 3986 6.2.2 mirror: uppercase hex, decode unreserved
        def fix(m):
            hx = m.group(1).upper()
            ch = chr(int(hx, 16))
            if ch.isascii() and (ch.isalnum() or ch in "-._~"):
                return ch
            return "%" + hx
        return _re.sub(r"%([0-9a-fA-F]{2})", fix, s)

    def mirror(u):
        sp = urlsplit(u)
        scheme = sp.scheme.lower()
        host = (sp.hostname or "").lower()
        if not scheme or not host:
            return None
        if not host.isascii():
            # pinned behavior: Spark's try_parse_url rejects non-ASCII
            # (Unicode-form IDN) hosts as malformed -> NULL key; only
            # wire-form (punycode xn--) hosts parse (docstring, r8)
            return None
        if _re.search(r"%(?![0-9a-fA-F]{2})", sp.path + "?" + sp.query):
            # likewise pinned: a malformed percent-escape makes the whole
            # URL malformed at parse time (java.net.URI strictness), so
            # the _normalize_pct passthrough branch is never reached via
            # canonicalize_url — it guards direct/composed callers
            return None
        port = ""
        if sp.port is not None and not (
                (scheme == "http" and sp.port == 80)
                or (scheme == "https" and sp.port == 443)):
            port = f":{sp.port}"
        path = norm_pct(sp.path or "/")
        keep = sorted(p for p in (norm_pct(p) for p in sp.query.split("&"))
                      if p and not _re.match(TRACKING_PARAM_RE, p))
        q = "?" + "&".join(keep) if keep else ""
        return f"{scheme}://{host}{port}{path}{q}"

    urls = [gen() for _ in range(250)]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i int, u string")
    got = {r.i: r.c for r in df.select(
        "i", canonicalize_url(F.col("u")).alias("c")).collect()}
    for i, u in enumerate(urls):
        assert got[i] == mirror(u), (u, got[i], mirror(u))
