"""Regex → required-literal prefilter (the RE2/Go-regexp index technique).

The reference accelerates ``$regex`` with a trigram Bloom prefilter over an
in-process index (``/root/reference/src/aggo/regex-search.ts:99+``,
``bloom-filter.ts:15-371``). The Spark-first re-expression has two layers:

1. **Scan-side (automatic, this module):** statically extract the literal
   substrings that *every* match of the pattern must contain, and AND them
   into the predicate as ``Column.contains`` conjuncts. ``contains`` is a
   necessary condition, so semantics are unchanged — but unlike ``rlike`` it
   is a data-source ``StringContains`` filter, so it reaches the parquet
   reader (row-group stats / dictionary pruning) and short-circuits codegen
   before the NFA runs. At 100 TB this turns "run a regex over every row"
   into "run a regex over rows that survive a vectorized substring check".

2. **Index-side (opt-in):** a trigram posting table
   (``operators/search.py:build_trigram_index``) — the same required
   literals, chopped to 3-grams, prune candidate doc ids by semi-join
   before the corpus is touched.

Literal extraction walks Python's own regex parse tree (``re._parser``),
so escaping/classes/alternation/quantifiers are handled by the real parser,
not a home-grown one. The walk is conservative: anything that is not a
definitely-once literal run (branches, classes, optional or variable
repeats, lookarounds, anchors) just breaks the current run — extracting
*nothing* is always sound (the prefilter is then a no-op).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # Python >= 3.11 moved sre internals under re.*
    from re import _constants as _c
    from re import _parser as _p
except ImportError:  # pragma: no cover - older interpreters
    import sre_constants as _c  # type: ignore[no-redef]
    import sre_parse as _p  # type: ignore[no-redef]

__all__ = ["required_literals", "regex_prefilter", "MIN_LITERAL_LEN"]

# contains('ab') already prunes well and stays under parquet's pushdown;
# single chars are near-useless (match almost every row)
MIN_LITERAL_LEN = 2


def _flags_from_options(options: str) -> int:
    flags = 0
    if "i" in options:
        flags |= re.IGNORECASE
    if "m" in options:
        flags |= re.MULTILINE
    if "s" in options:
        flags |= re.DOTALL
    if "x" in options:
        flags |= re.VERBOSE
    return flags


def _parse(pattern: str, options: str):
    """(parse_tree, effective_ignorecase) or (None, False).

    Inline global flags like ``(?i)...`` land on the parser state, not the
    caller's options string — read them back so the prefilter can't become
    case-strict against a case-insensitive pattern (a false-negative bug).
    """
    try:
        tree = _p.parse(pattern, _flags_from_options(options))
    except Exception:
        return None, False
    state_flags = getattr(getattr(tree, "state", None), "flags", 0)
    ci = bool((state_flags | _flags_from_options(options)) & re.IGNORECASE)
    return tree, ci


def required_literals(pattern: str, options: str = "") -> list[str]:
    """Literal substrings every match of ``pattern`` must contain.

    Returns ``[]`` when nothing useful can be proven (pure wildcard
    patterns, top-level alternation, unparseable input) — callers must
    treat that as "no prefilter", never as "no match".
    """
    tree, _ci = _parse(pattern, options)
    if tree is None:
        return []

    lits: list[str] = []
    run: list[str] = []

    def flush() -> None:
        if run:
            lits.append("".join(run))
            run.clear()

    def walk(seq) -> None:
        for op, av in seq:
            if op is _c.LITERAL:
                run.append(chr(av))
            elif op is _c.SUBPATTERN:
                # (group, add_flags, del_flags, subpattern): executes exactly
                # once — inline flag changes are rare; bail on them rather
                # than reason about scoped case-insensitivity
                add_flags = av[1]
                if add_flags:
                    flush()
                    continue
                walk(av[3])
            elif op in (_c.MAX_REPEAT, _c.MIN_REPEAT):
                lo, _hi, sub = av
                flush()
                if lo >= 1:
                    # the body occurs at least once → its own required
                    # literals hold; runs don't merge across the boundary
                    walk(sub)
                    flush()
            elif op is _c.AT:
                # anchors (^ $ \b) consume no characters: the run continues
                # on both sides is NOT guaranteed contiguity → break it
                flush()
            else:
                # BRANCH / IN / ANY / GROUPREF / lookarounds / ...:
                # contribute nothing, break the run
                flush()

    walk(tree)
    flush()
    out = sorted({l for l in lits if len(l) >= MIN_LITERAL_LEN}, key=len, reverse=True)
    # cap the conjunct count: the 4 longest literals carry nearly all the
    # selectivity; dozens of tiny contains() just bloat the plan
    return out[:4]


def regex_prefilter(col: Column, pattern: str, options: str = "") -> Column | None:
    """``contains`` conjunction implied by ``pattern``, or None.

    Case-insensitive patterns compare through ``lower()`` — still a codegen
    short-circuit ahead of the NFA, though no longer a pushable source
    filter (parquet `StringContains` is case-sensitive).
    """
    lits = required_literals(pattern, options)
    if not lits:
        return None
    _tree, ci = _parse(pattern, options)
    target = F.lower(col) if ci else col
    cond = None
    for lit in lits:
        c = target.contains(lit.lower() if ci else lit)
        cond = c if cond is None else (cond & c)
    return cond
