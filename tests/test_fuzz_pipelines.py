"""Randomized differential testing of whole PIPELINES — the reference's
randomized-pipeline parity suite
(/root/reference/tests/parity-ivm-hotpath.spec.js:56+): random
$match/$addFields/$group/$sort/$limit pipelines are run by the Spark engine
AND a pure-Python pipeline interpreter over the same rows; results must
agree exactly (integer-only measures, multiset compare).
"""

from __future__ import annotations

import pytest

import math
import random

from aggo_spark import Engine

# marked slow (r14): excluded from the default driver gate, run with -m slow
pytestmark = pytest.mark.slow


N_PIPELINES = 40
N_ROWS = 60
SEED = 20260814

FIELDS = ["i", "j", "k"]
GROUPS = ["a", "b", "c", "d", "e"]


def make_rows(rng: random.Random):
    return [
        {"i": rng.randint(-20, 20), "j": rng.randint(-20, 20),
         "k": rng.randint(0, 9), "g": rng.choice(GROUPS)}
        for _ in range(N_ROWS)
    ]


# -- random stage generators: each returns (stage_json, py_transform, out_fields)

def gen_match(rng, fields):
    f = rng.choice([x for x in fields if x != "g"] or fields)
    if f == "g":
        v = rng.choice(GROUPS)
        return {"$match": {"g": v}}, lambda rows: [r for r in rows if r["g"] == v]
    op = rng.choice(["$gte", "$lt", "$ne"])
    v = rng.randint(-10, 10)
    py = {"$gte": lambda a, b: a >= b, "$lt": lambda a, b: a < b,
          "$ne": lambda a, b: a != b}[op]
    return ({"$match": {f: {op: v}}},
            lambda rows: [r for r in rows if py(r[f], v)])


def gen_num_expr(rng, fields, depth=2):
    """(expr_json, py_fn(row) -> int) over integer fields."""
    nums = [x for x in fields if x != "g"]
    if depth <= 0 or rng.random() < 0.35:
        if rng.random() < 0.4:
            v = rng.randint(-10, 10)
            return v, lambda r, v=v: v
        f = rng.choice(nums)
        return f"${f}", lambda r, f=f: r[f]
    op = rng.choice(["$add", "$subtract", "$multiply", "$abs", "$mod"])
    if op == "$abs":
        e, fn = gen_num_expr(rng, fields, depth - 1)
        return {"$abs": e}, lambda r, fn=fn: abs(fn(r))
    if op == "$mod":
        e, fn = gen_num_expr(rng, fields, depth - 1)
        d = rng.choice([3, 5, 7])
        return {"$mod": [e, d]}, lambda r, fn=fn, d=d: int(math.fmod(fn(r), d))
    a, fa = gen_num_expr(rng, fields, depth - 1)
    b, fb = gen_num_expr(rng, fields, depth - 1)
    if op == "$add":
        return {"$add": [a, b]}, lambda r, fa=fa, fb=fb: fa(r) + fb(r)
    if op == "$subtract":
        return {"$subtract": [a, b]}, lambda r, fa=fa, fb=fb: fa(r) - fb(r)
    return {"$multiply": [a, b]}, lambda r, fa=fa, fb=fb: fa(r) * fb(r)


def gen_add_fields(rng, fields):
    name = f"c{rng.randint(0, 99)}"
    e, fn = gen_num_expr(rng, fields)
    def tr(rows, name=name, fn=fn):
        return [{**r, name: fn(r)} for r in rows]
    return {"$addFields": {name: e}}, tr, fields + [name] if name not in fields else fields


def gen_group(rng, fields):
    """Group by g / mod-expr / null with $sum/$min/$max/count measures."""
    mode = rng.choice(["g", "expr", "null"])
    if mode == "g":
        id_json, key_fn = "$g", (lambda r: r["g"])
    elif mode == "expr":
        e, fn = gen_num_expr(rng, fields, depth=1)
        id_json, key_fn = {"$mod": [{"$abs": e}, 4]}, (
            lambda r, fn=fn: int(math.fmod(abs(fn(r)), 4)))
    else:
        id_json, key_fn = None, (lambda r: None)
    aggs, py_aggs = {}, {}
    for n in range(rng.randint(1, 3)):
        name = f"m{n}"
        kind = rng.choice(["sum", "min", "max", "count", "sumexpr"])
        if kind == "count":
            aggs[name] = {"$sum": 1}
            py_aggs[name] = lambda vals: len(vals)
            e_fn = lambda r: 0
        else:
            e, e_fn = gen_num_expr(rng, fields, depth=1)
            if kind in ("sum", "sumexpr"):
                aggs[name] = {"$sum": e}
                py_aggs[name] = lambda vals: sum(vals)
            elif kind == "min":
                aggs[name] = {"$min": e}
                py_aggs[name] = lambda vals: min(vals) if vals else None
            else:
                aggs[name] = {"$max": e}
                py_aggs[name] = lambda vals: max(vals) if vals else None
        aggs[name] = aggs[name]
        py_aggs[name] = (py_aggs[name], e_fn)

    def tr(rows, key_fn=key_fn, py_aggs=py_aggs):
        buckets: dict = {}
        for r in rows:
            buckets.setdefault(key_fn(r), []).append(r)
        out = []
        for key, rs in buckets.items():
            row = {"_id": key}
            for name, (agg, e_fn) in py_aggs.items():
                row[name] = agg([e_fn(r) for r in rs])
            out.append(row)
        return out

    return ({"$group": {"_id": id_json, **aggs}}, tr,
            ["_id"] + list(aggs.keys()))


def gen_sort_limit(rng, fields):
    """Total-order sort (all fields as tie-break chain) + limit — the only
    order-sensitive composition, so the sort key must be total."""
    dirs = {f: rng.choice([1, -1]) for f in fields}
    n = rng.randint(1, 8)

    def tr(rows, dirs=dirs, n=n):
        def keyfn(r):
            ks = []
            for f, d in dirs.items():
                v = r[f]
                # None sorts first asc, last desc (MongoDB; engine matches)
                if d == 1:
                    ks.append((0 if v is None else 1, v if v is not None else 0))
                else:
                    ks.append((0 if v is not None else 1, _neg(v) if v is not None else 0))
            return tuple(ks)
        return sorted(rows, key=keyfn)[:n]

    return [{"$sort": dict(dirs)}, {"$limit": n}], tr


def _neg(v):
    if isinstance(v, str):
        return tuple(-ord(c) for c in v)
    return -v


def canon(rows, fields):
    return sorted(tuple(str(r.get(f)) for f in sorted(fields)) for r in rows)


def test_random_pipelines_match_python(spark):
    rng = random.Random(SEED)
    rows = make_rows(rng)
    df = spark.createDataFrame(rows, "i long, j long, k long, g string")
    eng = Engine()

    failures = []
    for trial in range(N_PIPELINES):
        fields = FIELDS + ["g"]
        pipeline, transforms = [], []
        if rng.random() < 0.7:
            s, tr = gen_match(rng, fields)
            pipeline.append(s); transforms.append(tr)
        if rng.random() < 0.6:
            s, tr, fields = gen_add_fields(rng, fields)
            pipeline.append(s); transforms.append(tr)
        if rng.random() < 0.4:
            s, tr = gen_match(rng, fields)
            pipeline.append(s); transforms.append(tr)
        grouped = rng.random() < 0.6
        if grouped:
            s, tr, fields = gen_group(rng, fields)
            pipeline.append(s); transforms.append(tr)
        if rng.random() < 0.5:
            stages, tr = gen_sort_limit(rng, fields)
            pipeline.extend(stages); transforms.append(tr)
        if not pipeline:
            pipeline = [{"$match": {"i": {"$gte": -100}}}]
            transforms = [lambda rs: [r for r in rs if r["i"] >= -100]]

        expected = rows
        for tr in transforms:
            expected = tr(expected)

        got = [r.asDict(recursive=True) for r in eng.aggregate(df, pipeline).collect()]
        if canon(got, fields) != canon(expected, fields):
            failures.append((trial, pipeline,
                             canon(got, fields)[:3], canon(expected, fields)[:3]))

    assert not failures, f"{len(failures)} mismatching pipelines; first: {failures[0]}"


def test_random_lookup_unwind_matches_python(spark):
    """Differential fuzz for the $lookup+$unwind path (fused join rewrite):
    random foreign tables / preserve flags / duplicate keys vs a
    nested-loop Python mirror."""
    rng = random.Random(SEED + 1)
    rows = make_rows(rng)
    df = spark.createDataFrame(rows, "i long, j long, k long, g string")

    failures = []
    for trial in range(20):
        eng = Engine()
        fkeys = rng.sample(range(0, 10), k=rng.randint(2, 6))
        frows = [{"fk": k_, "fv": k_ * 10 + d}
                 for k_ in fkeys for d in range(rng.randint(1, 2))]
        eng.register("f", spark.createDataFrame(frows, "fk long, fv long"))
        preserve = rng.random() < 0.5
        unwind = ({"$unwind": {"path": "$m", "preserveNullAndEmptyArrays": True}}
                  if preserve else {"$unwind": "$m"})
        lo = rng.randint(0, 5)
        pipeline = [
            {"$match": {"k": {"$gte": lo}}},
            {"$lookup": {"from": "f", "localField": "k",
                         "foreignField": "fk", "as": "m"}},
            unwind,
            {"$project": {"_id": 0, "i": 1, "k": 1, "g": 1, "fv": "$m.fv"}},
        ]

        expected = []
        for r in rows:
            if r["k"] < lo:
                continue
            matches = [fr for fr in frows if fr["fk"] == r["k"]]
            if matches:
                for m in matches:
                    expected.append({"i": r["i"], "k": r["k"], "g": r["g"],
                                     "fv": m["fv"]})
            elif preserve:
                expected.append({"i": r["i"], "k": r["k"], "g": r["g"], "fv": None})

        got = [r.asDict() for r in eng.aggregate(df, pipeline).collect()]
        flds = ["i", "k", "g", "fv"]
        if canon(got, flds) != canon(expected, flds):
            failures.append((trial, preserve, canon(got, flds)[:3],
                             canon(expected, flds)[:3]))

    assert not failures, f"{len(failures)} mismatches; first: {failures[0]}"


def test_random_unwind_lookup_group_matches_python(spark):
    """Differential fuzz for the $unwind → $lookup(+$unwind fused) → $group
    chain — the composition shape behind the r3 query consolidation (merged
    contract queries stack these), which fixed oracles alone wouldn't guard."""
    rng = random.Random(SEED + 2)

    failures = []
    for trial in range(15):
        eng = Engine()
        rows = [
            {"d": n, "g": rng.choice(GROUPS),
             "arr": [rng.randint(0, 9) for _ in range(rng.randint(0, 4))]}
            for n in range(30)
        ]
        df = spark.createDataFrame(rows, "d long, g string, arr array<long>")
        fkeys = rng.sample(range(0, 10), k=rng.randint(3, 7))
        frows = [{"fk": k_, "fv": k_ * 10 + d}
                 for k_ in fkeys for d in range(rng.randint(1, 2))]
        eng.register("f", spark.createDataFrame(frows, "fk long, fv long"))
        preserve = rng.random() < 0.5
        unwind_m = ({"$unwind": {"path": "$m", "preserveNullAndEmptyArrays": True}}
                    if preserve else {"$unwind": "$m"})
        pipeline = [
            {"$unwind": "$arr"},
            {"$lookup": {"from": "f", "localField": "arr",
                         "foreignField": "fk", "as": "m"}},
            unwind_m,
            {"$group": {"_id": "$g", "n": {"$sum": 1}, "sa": {"$sum": "$arr"},
                        "mx": {"$max": "$m.fv"}}},
        ]

        flat = []
        for r in rows:
            for a in r["arr"]:
                matches = [fr for fr in frows if fr["fk"] == a]
                if matches:
                    flat.extend({"g": r["g"], "a": a, "fv": m["fv"]} for m in matches)
                elif preserve:
                    flat.append({"g": r["g"], "a": a, "fv": None})
        expected = []
        buckets: dict = {}
        for fr in flat:
            buckets.setdefault(fr["g"], []).append(fr)
        for g, rs in buckets.items():
            fvs = [x["fv"] for x in rs if x["fv"] is not None]
            expected.append({"_id": g, "n": len(rs), "sa": sum(x["a"] for x in rs),
                             "mx": max(fvs) if fvs else None})

        got = [r.asDict() for r in eng.aggregate(df, pipeline).collect()]
        flds = ["_id", "n", "sa", "mx"]
        if canon(got, flds) != canon(expected, flds):
            failures.append((trial, preserve, canon(got, flds)[:3],
                             canon(expected, flds)[:3]))

    assert not failures, f"{len(failures)} mismatches; first: {failures[0]}"


def test_random_sort_first_last_matches_python(spark):
    """Differential fuzz for $sort → $group $first/$last across random
    direction mixes — including descending STRING components, which take the
    r4 dense-rank-surrogate path instead of a partition-order fallback.
    Sort keys always end with the unique doc id, so picks are total-order
    deterministic and the Python mirror is exact."""
    rng = random.Random(SEED + 4)

    failures = []
    for trial in range(25):
        rows = [
            {"d": n, "g": rng.choice(GROUPS), "i": rng.randint(-9, 9),
             "s": rng.choice(["ap", "be", "ca", "do", "el", None])}
            for n in range(40)
        ]
        df = spark.createDataFrame(rows, "d long, g string, i long, s string")
        keys = rng.sample(["i", "s"], k=rng.randint(1, 2)) + ["d"]
        sort_spec = {k: rng.choice([1, -1]) for k in keys}
        pipeline = [
            {"$sort": dict(sort_spec)},
            {"$group": {"_id": "$g", "f": {"$first": "$d"}, "l": {"$last": "$d"}}},
        ]

        def keyfn(r, spec=sort_spec):
            ks = []
            for f, d in spec.items():
                v = r[f]
                # engine null placement matches $sort in EVERY pick path
                # (r4): asc -> nulls first, desc -> nulls last — MongoDB's
                # placement too. (Before r4 the mixed-direction inverted/
                # rank paths put desc nulls first, contradicting the
                # engine's own sorted stream.)
                if d == 1:
                    ks.append((0, 0) if v is None else (1, v))
                else:
                    ks.append((2, 0) if v is None else (1, _neg(v)))
            return tuple(ks)

        expected = []
        buckets: dict = {}
        for r in sorted(rows, key=keyfn):
            buckets.setdefault(r["g"], []).append(r["d"])
        for g, ds in buckets.items():
            expected.append({"_id": g, "f": ds[0], "l": ds[-1]})

        got = [r.asDict() for r in Engine().aggregate(df, pipeline).collect()]
        flds = ["_id", "f", "l"]
        if canon(got, flds) != canon(expected, flds):
            failures.append((trial, sort_spec, canon(got, flds)[:3],
                             canon(expected, flds)[:3]))

    assert not failures, f"{len(failures)} mismatches; first: {failures[0]}"


def test_random_group_then_window_matches_python(spark):
    """Differential fuzz for post-$group $setWindowFields compositions:
    random grouped measures feed a window with rank / bounded running sum /
    full-partition total, vs a pure-Python mirror. Sort keys carry an _id
    tiebreak so document-frame semantics are total-order deterministic."""
    rng = random.Random(SEED + 3)
    base_rows = make_rows(rng)
    df = spark.createDataFrame(base_rows, "i long, j long, k long, g string")

    failures = []
    for trial in range(15):
        eng = Engine()
        e, e_fn = gen_num_expr(rng, FIELDS + ["g"], depth=1)
        m0_dir = rng.choice([1, -1])
        nparts = rng.choice([1, 2, 3])
        pipeline = [
            {"$group": {"_id": "$g", "m0": {"$sum": e}, "m1": {"$sum": 1}}},
            {"$addFields": {"p": {"$mod": ["$m1", nparts]}}},
            {"$setWindowFields": {
                "partitionBy": "$p",
                "sortBy": {"m0": m0_dir, "_id": 1},
                "output": {
                    "rk": {"$rank": {}},
                    "run": {"$sum": "$m0",
                            "window": {"documents": ["unbounded", "current"]}},
                    "tot": {"$sum": "$m0"},
                },
            }},
        ]

        groups: dict = {}
        for r in base_rows:
            groups.setdefault(r["g"], []).append(r)
        grows = [{"_id": g, "m0": sum(e_fn(r) for r in rs), "m1": len(rs)}
                 for g, rs in groups.items()]
        for gr in grows:
            gr["p"] = gr["m1"] % nparts
        expected = []
        parts: dict = {}
        for gr in grows:
            parts.setdefault(gr["p"], []).append(gr)
        for _, rs in parts.items():
            rs = sorted(rs, key=lambda r: (r["m0"] * m0_dir, r["_id"]))
            tot = sum(r["m0"] for r in rs)
            run = 0
            for pos, r in enumerate(rs):
                run += r["m0"]
                # _id tiebreak makes keys distinct -> rank == position + 1
                expected.append({**r, "rk": pos + 1, "run": run, "tot": tot})

        got = [r.asDict() for r in eng.aggregate(df, pipeline).collect()]
        flds = ["_id", "m0", "m1", "p", "rk", "run", "tot"]
        if canon(got, flds) != canon(expected, flds):
            failures.append((trial, canon(got, flds)[:3], canon(expected, flds)[:3]))

    assert not failures, f"{len(failures)} mismatches; first: {failures[0]}"


def test_random_timeseries_window_ops_match_python(spark):
    """Differential fuzz for the r4 time-series window operators ($locf,
    $linearFill, $derivative, $integral) on random gappy series vs exact
    Python mirrors. Sort keys are unique ints per partition, so every
    semantics question (null runs, edges, frame math) is deterministic."""
    rng = random.Random(SEED + 5)

    failures = []
    for trial in range(12):
        rows_in = []
        for u in range(3):
            ts = sorted(rng.sample(range(0, 40), k=rng.randint(2, 10)))
            for t in ts:
                v = None if rng.random() < 0.35 else float(rng.randint(-20, 20))
                rows_in.append({"u": u, "t": t, "v": v})
        df = spark.createDataFrame(
            [(r["u"], r["t"], r["v"]) for r in rows_in], "u long, t long, v double")
        out = Engine().aggregate(df, [
            {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                                  "output": {
                                      "locf": {"$locf": "$v"},
                                      "lf": {"$linearFill": "$v"},
                                      "dv": {"$derivative": {"input": "$v"},
                                             "window": {"documents": [-1, 0]}},
                                      "ig": {"$integral": {"input": "$v"},
                                             "window": {"documents": ["unbounded", "current"]}},
                                  }}}]).collect()
        got = {(r["u"], r["t"]): (r["locf"], r["lf"], r["dv"], r["ig"])
               for r in out}

        expected = {}
        parts: dict = {}
        for r in rows_in:
            parts.setdefault(r["u"], []).append(r)
        for u, rs in parts.items():
            rs = sorted(rs, key=lambda r: r["t"])
            n = len(rs)
            # locf
            last_v = None
            locf = []
            for r in rs:
                if r["v"] is not None:
                    last_v = r["v"]
                locf.append(last_v)
            # linearFill
            lf = []
            for i, r in enumerate(rs):
                if r["v"] is not None:
                    lf.append(r["v"])
                    continue
                prev = next(((rs[j]["t"], rs[j]["v"]) for j in range(i - 1, -1, -1)
                             if rs[j]["v"] is not None), None)
                nxt = next(((rs[j]["t"], rs[j]["v"]) for j in range(i + 1, n)
                            if rs[j]["v"] is not None), None)
                if prev and nxt and nxt[0] != prev[0]:
                    px, pv = prev
                    nx, nv = nxt
                    lf.append(pv + (nv - pv) * (r["t"] - px) / (nx - px))
                else:
                    lf.append(None)
            # derivative over [-1, 0] frame: (v_i - v_{i-1}) / (t_i - t_{i-1})
            dv = []
            for i, r in enumerate(rs):
                if i == 0 or r["v"] is None or rs[i - 1]["v"] is None:
                    dv.append(None)
                else:
                    dv.append((r["v"] - rs[i - 1]["v"]) / (r["t"] - rs[i - 1]["t"]))
            # integral unbounded..current: sum of trapezoids; null endpoints
            # make that trapezoid null -> skipped by the sum
            ig, acc = [], 0.0
            for i, r in enumerate(rs):
                if i > 0 and r["v"] is not None and rs[i - 1]["v"] is not None:
                    acc += (r["v"] + rs[i - 1]["v"]) / 2 * (r["t"] - rs[i - 1]["t"])
                ig.append(acc)
            for r, a, b, c, d in zip(rs, locf, lf, dv, ig):
                expected[(u, r["t"])] = (a, b, c, d)

        for key in expected:
            g, e = got[key], expected[key]
            for gi, ei in zip(g, e):
                ok = (gi is None and ei is None) or (
                    gi is not None and ei is not None and abs(gi - ei) < 1e-9)
                if not ok:
                    failures.append((trial, key, g, e))
                    break

    assert not failures, f"{len(failures)} mismatches; first: {failures[0]}"


def test_random_exp_moving_avg_matches_python(spark):
    """Differential fuzz for the applyInPandas $expMovingAvg path: random
    gappy series vs the textbook recurrence EMA_i = a*x_i + (1-a)*EMA_{i-1}
    (nulls skip the state update and inherit the previous EMA)."""
    rng = random.Random(SEED + 6)

    failures = []
    for trial in range(8):
        rows_in = []
        for u in range(3):
            for t in sorted(rng.sample(range(0, 30), k=rng.randint(1, 8))):
                v = None if rng.random() < 0.25 else float(rng.randint(-9, 9))
                rows_in.append({"u": u, "t": t, "v": v})
        alpha = rng.choice([0.2, 0.5, 0.8])
        df = spark.createDataFrame(
            [(r["u"], r["t"], r["v"]) for r in rows_in], "u long, t long, v double")
        out = Engine().aggregate(df, [
            {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                                  "output": {"e": {"$expMovingAvg": {
                                      "input": "$v", "alpha": alpha}}}}}]).collect()
        got = {(r["u"], r["t"]): r["e"] for r in out}

        parts: dict = {}
        for r in rows_in:
            parts.setdefault(r["u"], []).append(r)
        for u, rs in parts.items():
            ema = None
            for r in sorted(rs, key=lambda r: r["t"]):
                if r["v"] is not None:
                    ema = r["v"] if ema is None else alpha * r["v"] + (1 - alpha) * ema
                g = got[(u, r["t"])]
                ok = (g is None and ema is None) or (
                    g is not None and ema is not None and abs(g - ema) < 1e-9)
                if not ok:
                    failures.append((trial, u, r["t"], g, ema))

    assert not failures, f"{len(failures)} mismatches; first: {failures[0]}"
