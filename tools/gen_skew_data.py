"""Generate hot-key SKEW variants of orders/documents under
``scaledata/skew/`` (judge r6 #5) — so the skew mitigations (salting,
AQE, LSH bucket-cap) are MEASURED, not just plan-asserted.

Equal-row-count pairs, so walls compare apples to apples:

- ``orders_uniform`` / ``orders_skew`` — K× the sf0.1 orders rows
  (key-shifted copies, like gen_scale_data). The skew variant remaps
  ``o_custkey`` zipf-style: ``HOT_FRAC`` of all rows collapse onto ONE
  customer (the "whale account"), the rest keep their uniform key. At
  K=10 that is ~600k rows behind a single group key.
- ``documents_uniform`` / ``documents_skew`` — the 5k sf0.1 documents;
  the skew variant overwrites ``DUP_FRAC`` of texts with copies drawn
  from ``N_TEMPLATES`` hot templates (real near-dup clusters: each
  template's copies share a MinHash signature, so LSH buckets blow up
  to ~cluster size — the degenerate-content shape bucket_cap exists
  for).

Usage: python tools/gen_skew_data.py [K] [out_dir]
  K default 10; out_dir default /root/repo/scaledata/skew
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
HOT_FRAC = 0.4       # share of order rows on the single hot custkey
DUP_FRAC = 0.4       # share of documents replaced by hot-template copies
N_TEMPLATES = 20     # distinct hot templates (clusters of ~DUP*N/20 docs)
SEED = 7


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        Path(__file__).resolve().parent.parent / "scaledata" / "skew")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SELECT setseed({SEED / 10})")

    # K key-shifted copies of orders = the uniform baseline (same method
    # as gen_scale_data: distributions exactly sf0.1's, keys disjoint)
    con.execute(f"""
        CREATE TEMP TABLE ou AS
        SELECT o_orderkey + cp * 150000 AS o_orderkey,
               o_custkey + cp * 15000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', (SELECT unnest(range({k})) AS cp)
    """)
    con.execute(f"COPY ou TO '{out}/orders_uniform.parquet' (FORMAT PARQUET)")
    # skew: HOT_FRAC of rows (seeded hash coin, deterministic) collapse
    # onto custkey 1; row count and every non-key column identical
    con.execute(f"""
        COPY (
          SELECT o_orderkey,
                 CASE WHEN (hash(o_orderkey) % 1000) < {int(HOT_FRAC * 1000)}
                      THEN 1 ELSE o_custkey END AS o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM ou
        ) TO '{out}/orders_skew.parquet' (FORMAT PARQUET)
    """)

    # documents: uniform = sf0.1 as-is; skew = DUP_FRAC of docs replaced
    # by one of N_TEMPLATES template texts (drawn from the corpus itself)
    con.execute(f"""
        CREATE TEMP TABLE docs AS
        SELECT * FROM '{SRC}/documents.parquet'
    """)
    con.execute(
        f"COPY docs TO '{out}/documents_uniform.parquet' (FORMAT PARQUET)")
    con.execute(f"""
        CREATE TEMP TABLE templates AS
        SELECT row_number() OVER () - 1 AS tid, text AS ttext
        FROM (SELECT text FROM docs ORDER BY hash(doc_id + 99) LIMIT {N_TEMPLATES})
    """)
    con.execute(f"""
        COPY (
          SELECT d.doc_id,
                 CASE WHEN (hash(d.doc_id) % 1000) < {int(DUP_FRAC * 1000)}
                      THEN t.ttext ELSE d.text END AS text,
                 d.lang, d.source,
                 CASE WHEN (hash(d.doc_id) % 1000) < {int(DUP_FRAC * 1000)}
                      THEN length(t.ttext) ELSE d.n_chars END AS n_chars
          FROM docs d
          JOIN templates t ON t.tid = hash(d.doc_id + 1) % {N_TEMPLATES}
        ) TO '{out}/documents_skew.parquet' (FORMAT PARQUET)
    """)

    for t in ("orders_uniform", "orders_skew",
              "documents_uniform", "documents_skew"):
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    hot = con.sql(f"""
        SELECT count(*) FROM '{out}/orders_skew.parquet' WHERE o_custkey = 1
    """).fetchone()[0]
    print(f"hot custkey share: {hot}")


if __name__ == "__main__":
    main()
