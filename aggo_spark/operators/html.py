"""HTML → text extraction for crawl-derived training data.

C4/CCNet-class pipelines start from crawled HTML: strip markup, then
classify text blocks as content vs boilerplate (navigation, footers,
cookie banners) before any quality/dedup stage sees the text. The
reference engine has no HTML surface; this module supplies the two
standard tiers, Spark-first:

- :func:`strip_html` — a pure-Column ``regexp_replace`` chain (JVM
  regex, whole-stage codegen, scan-parallel: no UDF, no shuffle).
  A regex stripper is the documented approximation of a real HTML
  parser: attribute values containing ``>`` and malformed nesting can
  leak fragments — the standard trade for running at crawl scale
  inside the scan. Script/style/comment bodies are removed, block-level
  openers AND closers become paragraph breaks (auto-closing <p>/<li>
  included, r8), the six ubiquitous named entities are decoded, and
  numeric character references (``&#8217;``/``&#x27;``, hex and
  decimal, full astral range) decode through a contains-gated
  split/transform/array_join rebuild (r8 — see
  :func:`_decode_entities` — single-pass with the named entities).
- :func:`html_blocks` — explode the stripped text into blocks and score
  each with codegen signals (word count, stopword density — the jusText
  heuristic, Pomikálek 2011): explode + plain columns rather than
  nested interpreted HOFs, per the engine's codegen-over-HOF rule.
- :func:`extract_main_text` — content blocks reassembled per doc
  (sort_array over collected (block_no, block) structs: one shuffle,
  order-exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import LANG_STOPWORDS, _stop_hits, tokens

__all__ = [
    "strip_html",
    "html_blocks",
    "extract_main_text",
    "decode_html_bytes",
    "sniff_charset",
]

# block-level elements whose CLOSE ends a text block (jusText's block
# segmentation); inline tags (a, b, span, em, ...) dissolve into spaces
_BLOCK_TAGS = ("p|div|h[1-6]|li|ul|ol|dl|dd|dt|table|tr|th|td|blockquote|"
               "pre|section|article|aside|header|footer|nav|figure|"
               "figcaption|form|fieldset")


# the six named entities that dominate real pages (case-sensitive, the
# canonical HTML forms); decoded in ONE pass together with numeric refs
_NAMED_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                   ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"))
_END = 0x7FFFFFFF  # substring 'to end of string' length


# charset sniffing + decode (r13) ------------------------------------------
#
# Real crawls are NOT all UTF-8: WHATWG's encoding sniffing order is
# BOM > transport (HTTP header charset=) > in-document <meta> declaration,
# with a default fallback. We implement BOM > meta > header > utf-8:
# the meta-over-header preference matches deployed extractor practice
# (CCNet/jusText pipelines trust the page author over frequently-wrong
# server config; WHATWG ranks transport higher — the difference only
# shows when BOTH are present and disagree, where either choice is
# defensible and ours is pinned by tests). Everything runs JVM-side:
# the sniff is substring/regexp on a latin-1 view of the prefix (latin-1
# decode is total, bytes<->chars 1:1) and the decode is a CASE over
# ``F.decode`` literals for the curated charset set below. Requires the
# session confs spark.sql.legacy.javaCharsets=true (full Java charset
# names) and spark.sql.legacy.codingErrorAction=true (malformed input
# -> U+FFFD replacement, the crawl semantics, instead of task failure)
# — :func:`decode_html_bytes` sets both (runtime-settable).

# alias (lowercased, stripped) -> Java charset name. Unknown charsets
# fall back to utf-8-with-replacement (the CCNet default); GB2312/GBK
# route to the GB18030 superset.
_CHARSET_ALIASES = {
    "utf-8": "UTF-8", "utf8": "UTF-8",
    "us-ascii": "US-ASCII", "ascii": "US-ASCII",
    "iso-8859-1": "ISO-8859-1", "iso8859-1": "ISO-8859-1",
    "latin-1": "ISO-8859-1", "latin1": "ISO-8859-1", "l1": "ISO-8859-1",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "win-1252": "windows-1252", "x-cp1252": "windows-1252",
    "iso-8859-15": "ISO-8859-15",
    "iso-8859-2": "ISO-8859-2", "latin2": "ISO-8859-2",
    "windows-1250": "windows-1250",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "koi8-r": "KOI8-R", "koi8-u": "KOI8-U",
    "iso-8859-5": "ISO-8859-5",
    "iso-8859-7": "ISO-8859-7", "windows-1253": "windows-1253",
    "iso-8859-9": "ISO-8859-9", "windows-1254": "windows-1254",
    "windows-1255": "windows-1255", "windows-1256": "windows-1256",
    "windows-1257": "windows-1257", "windows-1258": "windows-1258",
    "shift_jis": "Shift_JIS", "shift-jis": "Shift_JIS",
    "sjis": "Shift_JIS", "x-sjis": "Shift_JIS", "ms932": "windows-31j",
    "windows-31j": "windows-31j", "cp932": "windows-31j",
    "euc-jp": "EUC-JP", "iso-2022-jp": "ISO-2022-JP",
    "gb2312": "GB18030", "gbk": "GB18030", "gb18030": "GB18030",
    "big5": "Big5", "big5-hkscs": "Big5-HKSCS",
    "euc-kr": "EUC-KR", "ks_c_5601-1987": "EUC-KR", "ksc5601": "EUC-KR",
    "tis-620": "TIS-620", "windows-874": "x-windows-874",
    "utf-16": "UTF-16", "utf-16le": "UTF-16LE", "utf-16be": "UTF-16BE",
}
# distinct decode targets (CASE branch per entry)
_CHARSET_TARGETS = sorted(set(_CHARSET_ALIASES.values()))

_META_CHARSET_RE = (r'(?i)<meta[^>]{0,256}?charset\s*=\s*["\']?'
                    r'\s*([A-Za-z0-9._:\-]+)')


def sniff_charset(payload: Column,
                  header_charset: Column | None = None) -> Column:
    """Effective charset NAME (Java canonical, from the curated set)
    for an HTML payload: BOM > ``<meta charset>`` / ``http-equiv``
    declaration (first 2048 bytes, latin-1 view) > HTTP header charset
    > 'UTF-8'. Unknown/unsupported declarations fall through to the
    next source."""
    hex3 = F.upper(F.hex(F.substring(payload, 1, 3)))
    meta_raw = F.lower(F.regexp_extract(
        F.decode(F.substring(payload, 1, 2048), "iso-8859-1"),
        _META_CHARSET_RE, 1))
    alias_map = F.create_map(
        *[F.lit(x) for kv in _CHARSET_ALIASES.items() for x in kv])
    meta = alias_map[meta_raw]
    hdr = (alias_map[F.lower(F.trim(header_charset))]
           if header_charset is not None else F.lit(None))
    return (
        F.when(hex3.startswith("EFBBBF"), F.lit("UTF-8"))
        .when(hex3.startswith("FFFE"), F.lit("UTF-16LE"))
        .when(hex3.startswith("FEFF"), F.lit("UTF-16BE"))
        .otherwise(F.coalesce(meta, hdr, F.lit("UTF-8"))))


def decode_html_bytes(
    df: DataFrame,
    payload_col: str = "payload",
    charset_col: str | None = "http_charset",
    out_col: str = "text",
) -> DataFrame:
    """Charset-aware text decode of an HTML byte column (r13): adds
    ``out_col`` (decoded text, leading BOM stripped, malformed bytes
    as U+FFFD) and ``charset`` (the sniffed name — an existing
    ``charset`` column is OVERWRITTEN). The decode is a pure-Column
    CASE over ``F.decode`` literals — JVM-side for every charset in
    the curated set, utf-8 fallback for the long tail."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    spark.conf.set("spark.sql.legacy.codingErrorAction", "true")
    payload = F.col(payload_col)
    cs = sniff_charset(
        payload, F.col(charset_col) if charset_col else None)
    # materialize the sniff once, then branch on the COLUMN — the CASE
    # would otherwise duplicate the prefix-regexp expression tree into
    # every branch condition (conditional expressions defeat Catalyst's
    # subexpression elimination)
    df = df.withColumn("charset", cs)
    expr = None
    for name in _CHARSET_TARGETS:
        branch = F.decode(payload, name)
        cond = F.col("charset") == name
        expr = (F.when(cond, branch) if expr is None
                else expr.when(cond, branch))
    decoded = expr.otherwise(F.decode(payload, "UTF-8"))
    return df.withColumn(out_col,
                         F.regexp_replace(decoded, "^\\uFEFF", ""))


def _decode_entities(c: Column) -> Column:
    """Decode HTML character references — numeric (``&#8217;`` /
    ``&#x27;``, full astral range) AND the six dominant named entities —
    in a SINGLE pass, pure Column (r8; single-pass rebuilt after the r8
    review found the two-pass form double-decoding ``&#38;lt;`` →
    live ``<``).

    Shape: split on lookahead ``(?=&)`` boundaries (each part begins
    with at most one candidate reference), ``transform`` each part —
    numeric: decimal digits cast directly / hex via ``conv(.,16,10)``,
    codepoint → character via ``decode(unhex(lpad(hex(cp),8)),'utf-32')``
    (UTF-32BE; ``char()`` wraps at 256 and is useless here); named: a
    startswith ladder — then ``array_join`` rebuild. Because each part
    decodes at most its LEADING reference and the output is never
    rescanned, escaped entities behave exactly like ``html.unescape``:
    ``&amp;lt;`` and ``&#38;lt;`` both yield the literal text ``&lt;``,
    never a live ``<``. Invalid references (overflow digits, cp 0,
    surrogates, > U+10FFFF, missing ``;``, unknown names) pass through
    verbatim.

    The transform lambda is interpreted (CodegenFallback), so the whole
    thing is gated on ``contains('&')`` — ampersand-free documents never
    leave codegen.
    """
    def dec(p: Column) -> Column:
        dec_digits = F.regexp_extract(p, r"^&#([0-9]{1,7});", 1)
        hex_digits = F.regexp_extract(p, r"^&#[xX]([0-9a-fA-F]{1,6});", 1)
        cp = (
            F.when(dec_digits != "", dec_digits.cast("long"))
            .when(hex_digits != "",
                  F.conv(hex_digits, 16, 10).cast("long"))
        )
        valid = (
            cp.isNotNull() & (cp > 0) & (cp <= 0x10FFFF)
            & ~((cp >= 0xD800) & (cp <= 0xDFFF))
        )
        ch = F.decode(F.unhex(F.lpad(F.hex(cp), 8, "0")), "utf-32")
        rest = F.regexp_replace(p, r"^&#[xX]?[0-9a-fA-F]{1,7};", "")
        expr = F.when(valid, F.concat(ch, rest))
        for ent, rep in _NAMED_ENTITIES:
            expr = expr.when(
                p.startswith(ent),
                F.concat(F.lit(rep), F.substring(p, len(ent) + 1, _END)))
        return expr.otherwise(p)

    decoded = F.array_join(F.transform(F.split(c, r"(?=&)"), dec), "")
    return F.when(c.contains("&"), decoded).otherwise(c)


def strip_html(col: Column) -> Column:
    """Markup-free text from an HTML column — pure Column, codegen.

    Order matters: container bodies (script/style/head/comments) vanish
    first, block closers become double newlines (block boundaries for
    :func:`html_blocks`), ``<br>`` a single newline, remaining tags a
    space, then entities decode and whitespace collapses (runs of
    spaces/tabs → one space, 3+ newlines → exactly two).
    """
    c = col
    # container elements whose text content must not survive — ONE
    # alternation+backreference pass, not one pass per tag (each
    # regexp_replace rescans the full text; measured 1.5× on the
    # documents-as-HTML fixture)
    c = F.regexp_replace(
        c,
        "(?is)<(script|style|noscript|head|svg|template)\\b[^>]*>"
        ".*?</\\1>",
        " ")
    c = F.regexp_replace(c, "(?s)<!--.*?-->", " ")
    # block boundaries before tags are dissolved — OPENING tags too (r8,
    # ADVICE): spec-valid HTML leaves <p>/<li>/<dd>... unclosed
    # (auto-closing elements, ubiquitous in real crawls), and emitting
    # boundaries only on closers merged such consecutive blocks into
    # one, degrading html_blocks' length/stopword classification. A
    # properly-closed block now yields newlines on both edges; the
    # 3+-newline collapse below restores exactly one blank-line boundary
    c = F.regexp_replace(c, f"(?i)</({_BLOCK_TAGS})>", "\n\n")
    c = F.regexp_replace(c, f"(?i)<({_BLOCK_TAGS})\\b[^>]*>", "\n\n")
    c = F.regexp_replace(c, "(?i)<br\\s*/?>", "\n")
    c = F.regexp_replace(c, "(?s)<[^>]+>", " ")
    # entity decode — numeric references and the six named entities in
    # ONE single-pass rebuild (see _decode_entities): each part decodes
    # at most its leading reference and the output is never rescanned,
    # so '&amp;lt;' and '&#38;lt;' both become the literal text '&lt;',
    # never a live '<' reintroduced into stripped output
    c = _decode_entities(c)
    c = F.regexp_replace(c, "[ \\t\\x0b\\f\\r]+", " ")
    c = F.regexp_replace(c, " ?\\n ?", "\n")
    c = F.regexp_replace(c, "\\n{3,}", "\n\n")
    # trim() strips spaces only; block-closer newlines at the edges need
    # the regex form
    return F.regexp_replace(c, "^\\s+|\\s+$", "")


def html_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = 10,
    stopword_frac: float = 0.25,
    lang: str = "en",
    cjk_aware: bool = False,
) -> DataFrame:
    """One row per text block of each stripped document, with the
    jusText-lite classification signals (Pomikálek 2011 §3 reduced to
    its two strongest features — length and stopword density; the link-
    density feature needs tag-context the stripped text no longer has,
    documented):

    (id, block_no, block, n_words, stop_frac,
     is_content = n_words >= min_words AND stop_frac >= stopword_frac)

    Plan: strip (narrow codegen) → split on blank lines → posexplode
    (one Generate) → per-block signals as plain columns. No shuffle;
    block signals stay inside whole-stage codegen except the InSet
    stopword probe.

    Space-delimited languages use the stopword tables as-is. With the
    default ``cjk_aware=False`` the r7-documented limitation stands: CJK
    blocks tokenize as one huge "word" and score ``stop_frac = 0`` →
    always boilerplate. ``cjk_aware=True`` (r9, verdict #2) routes each
    BLOCK by its CJK character fraction (``text.CJK_ROUTE_PCT``): routed
    blocks count char-BIGRAM pseudo-words (``tokens_cjk``) and are
    classified by the length feature alone (``n_words >= min_words``,
    ``stop_frac`` NULL) — jusText's stopword-density feature has no
    segmenter-free CJK analogue, and the length-only rule is its
    documented degraded mode. Unrouted blocks are classified exactly as
    before, so mixed documents get per-block routing.
    """
    if lang not in LANG_STOPWORDS:
        raise ValueError(
            f"lang must be one of {sorted(LANG_STOPWORDS)}, got {lang!r}")
    stripped = strip_html(F.col(html_col))
    blocks = F.filter(F.split(stripped, "\\n{2,}"),
                      lambda b: F.trim(b) != "")
    exploded = df.select(
        F.col(id_col),
        F.posexplode_outer(blocks).alias("block_no", "block"),
    )
    tok = tokens(F.col("block"))
    # NULL block (posexplode_outer row of a NULL/empty doc) → NULL
    # signals, never sizeOfNull's legacy -1
    n_words = F.when(F.col("block").isNotNull(),
                     F.greatest(F.size(tok), F.lit(0)))
    stop_frac = F.when(
        n_words > 0,
        _stop_hits(tok, LANG_STOPWORDS[lang]).cast("double") / n_words,
    ).when(n_words.isNotNull(), F.lit(0.0))
    is_content = (F.col("n_words") >= min_words) \
        & (F.col("stop_frac") >= stopword_frac)
    if cjk_aware:
        from .text import cjk_profile, n_tokens_cjk

        routed = cjk_profile(F.col("block"))["routed"]
        # routed pseudo-word count computed ARITHMETICALLY (r10, ADVICE:
        # the F.size(tokens_cjk(...)) form materialized the full bigram
        # array per block on the scan path just to take its size —
        # contrary to the codegen-over-HOF rule); n_tokens_cjk is pinned
        # equal to it by differential test
        n_words = F.when(
            F.col("block").isNotNull() & routed,
            F.greatest(n_tokens_cjk(F.col("block")), F.lit(0)),
        ).otherwise(n_words)
        stop_frac = F.when(routed, F.lit(None).cast("double")) \
            .otherwise(stop_frac)
        is_content = F.when(
            routed, F.col("n_words") >= min_words).otherwise(is_content)
    return (
        exploded
        .withColumn("n_words", n_words.cast("int"))
        .withColumn("stop_frac", F.round(stop_frac, 6))
        .withColumn("is_content", F.coalesce(is_content, F.lit(False)))
    )


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    out_col: str = "main_text",
    min_words: int = 10,
    stopword_frac: float = 0.25,
    lang: str = "en",
) -> DataFrame:
    """Boilerplate-free document text: the content blocks of
    :func:`html_blocks`, re-joined in order with blank lines. Docs whose
    every block is boilerplate (or NULL html) keep ``out_col`` as '' /
    NULL respectively, so downstream length filters see them honestly.

    One shuffle (the per-doc regroup); block order is restored by
    ``sort_array`` over (block_no, block) structs, not by assuming
    collect order.
    """
    blocks = html_blocks(df, html_col, id_col,
                         min_words=min_words,
                         stopword_frac=stopword_frac, lang=lang)
    main = (
        blocks.filter(F.col("is_content"))
        .groupBy(id_col)
        .agg(F.array_join(
            F.transform(
                F.sort_array(F.collect_list(
                    F.struct("block_no", "block"))),
                lambda s: s["block"]),
            "\n\n").alias(out_col))
    )
    return (
        df.join(main, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col(html_col).isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col(out_col), F.lit(""))))
    )
