#!/usr/bin/env bash
# Release validation: the full gate a round should pass before handing off.
#  1. unit + e2e + property + fault-injection tests
#  2. driver rehearsal (entry + every query vs its DuckDB oracle at sf0.01)
#  3. bench smoke at sf0.01
# Usage: scripts/validate.sh   (from the repo root; ~6 minutes)
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"

echo "== 1/3 pytest =="
python -m pytest tests/ -x -q

echo "== 2/3 driver rehearsal (sf0.01, value-level oracle comparison) =="
python - <<'EOF'
import sys, time
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as e
import duckdb, pandas as pd
import ray.data as rd

SF = "/root/testdata/sf0.01"
out = e.entry()
n = out.count() if isinstance(out, rd.Dataset) else len(out)
assert n > 0, "entry() produced no rows"
print(f"entry(): {n} rows")

def norm(df):
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

q, o = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
for name, fn in q.items():
    got = fn(SF)
    if isinstance(got, rd.Dataset):
        got = got.to_pandas()
    if name in o:
        want = con.execute(o[name]).df()
        pd.testing.assert_frame_equal(norm(got), norm(want), check_dtype=False, check_exact=True)
        print(f"  ok {name} ({len(got)} rows, oracle-equal)")
    else:
        print(f"  ok {name} ({len(got)} rows, rows-only)")
ray.shutdown()
print("rehearsal PASS")
EOF

echo "== 3/3 bench smoke (sf0.01) =="
GRAFT_SF_DIR=/root/testdata/sf0.01 RAY_GRAFT_CPUS=8 OTR_BENCH_REPS=1 python bench.py

echo "VALIDATION PASS"
