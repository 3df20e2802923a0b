"""Randomized differential testing of the expression compiler — the
reference's randomized-pipeline parity section
(/root/reference/tests/parity-ivm-hotpath.spec.js:56+) re-aimed: random
typed expression trees are evaluated by the Spark compiler AND a pure-Python
reference evaluator over the same rows; results must agree exactly.

Integer-only arithmetic keeps comparisons exact (no FP tolerance games);
all N expressions evaluate in ONE select so the suite costs one Spark job.
"""

from __future__ import annotations

import random

from aggo_spark import Engine

N_EXPRS = 120
N_ROWS = 40
SEED = 20260813


def gen_num(rng: random.Random, depth: int):
    """Returns (expr_json, py_fn(row) -> int)."""
    if depth <= 0 or rng.random() < 0.3:
        if rng.random() < 0.5:
            v = rng.randint(-20, 20)
            return v, lambda r, v=v: v
        f = rng.choice(["i", "j", "k"])
        return f"${f}", lambda r, f=f: r[f]
    op = rng.choice(["$add", "$subtract", "$multiply", "$abs", "$cond", "$mod"])
    if op in ("$add", "$subtract", "$multiply"):
        n = rng.randint(2, 3) if op == "$add" else 2
        subs = [gen_num(rng, depth - 1) for _ in range(n)]
        exprs = [s[0] for s in subs]
        fns = [s[1] for s in subs]
        if op == "$add":
            return {"$add": exprs}, lambda r, fns=fns: sum(f(r) for f in fns)
        if op == "$subtract":
            return {"$subtract": exprs}, lambda r, fns=fns: fns[0](r) - fns[1](r)
        return {"$multiply": exprs}, lambda r, fns=fns: fns[0](r) * fns[1](r)
    if op == "$abs":
        e, f = gen_num(rng, depth - 1)
        return {"$abs": e}, lambda r, f=f: abs(f(r))
    if op == "$mod":
        e, f = gen_num(rng, depth - 1)
        d = rng.choice([3, 5, 7])
        # Spark % truncates toward zero like C; Python % floors — use the
        # truncating form in the reference evaluator (int(math.fmod))
        import math

        return {"$mod": [e, d]}, lambda r, f=f, d=d: int(math.fmod(f(r), d))
    # $cond
    c, cf = gen_bool(rng, depth - 1)
    t, tf = gen_num(rng, depth - 1)
    e, ef = gen_num(rng, depth - 1)
    return (
        {"$cond": [c, t, e]},
        lambda r, cf=cf, tf=tf, ef=ef: tf(r) if cf(r) else ef(r),
    )


def gen_bool(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.3:
        a, af = gen_num(rng, 0)
        b, bf = gen_num(rng, 0)
        cmp = rng.choice(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"])
        pyop = {
            "$eq": lambda x, y: x == y, "$ne": lambda x, y: x != y,
            "$gt": lambda x, y: x > y, "$gte": lambda x, y: x >= y,
            "$lt": lambda x, y: x < y, "$lte": lambda x, y: x <= y,
        }[cmp]
        return {cmp: [a, b]}, lambda r, af=af, bf=bf, pyop=pyop: pyop(af(r), bf(r))
    op = rng.choice(["$and", "$or", "$not"])
    if op == "$not":
        e, f = gen_bool(rng, depth - 1)
        return {"$not": [e]}, lambda r, f=f: not f(r)
    subs = [gen_bool(rng, depth - 1) for _ in range(2)]
    exprs, fns = [s[0] for s in subs], [s[1] for s in subs]
    if op == "$and":
        return {"$and": exprs}, lambda r, fns=fns: all(f(r) for f in fns)
    return {"$or": exprs}, lambda r, fns=fns: any(f(r) for f in fns)


def test_random_expressions_match_python(spark):
    rng = random.Random(SEED)
    rows = [
        {"i": rng.randint(-50, 50), "j": rng.randint(-50, 50), "k": rng.randint(1, 30)}
        for _ in range(N_ROWS)
    ]
    df = spark.createDataFrame(rows, "i long, j long, k long")

    exprs, fns = [], []
    for n in range(N_EXPRS):
        e, f = (gen_num if n % 2 == 0 else gen_bool)(rng, 3)
        exprs.append(e)
        fns.append(f)

    project = {"_id": 0, **{f"e{n}": e for n, e in enumerate(exprs)}}
    # keep input fields for row alignment
    project.update({"i": 1, "j": 1, "k": 1})
    out = Engine().aggregate(df, [{"$project": project}]).collect()
    assert len(out) == N_ROWS

    by_key = {(r["i"], r["j"], r["k"]): r for r in out}
    mismatches = []
    for row in rows:
        got = by_key[(row["i"], row["j"], row["k"])]
        for n, f in enumerate(fns):
            expected = f(row)
            actual = got[f"e{n}"]
            if isinstance(expected, bool):
                ok = bool(actual) == expected
            else:
                ok = actual == expected
            if not ok:
                mismatches.append((n, exprs[n], row, expected, actual))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"
