#!/usr/bin/env python3
"""Audit oracle SQL result types for cross-engine hash hazards.

DuckDB promotes sum(BIGINT) to HUGEINT (and some arithmetic to DECIMAL);
pandas materializes HUGEINT as float64, so the driver's value hash diverges
from Spark's int64 even when every value is equal. This script DESCRIBEs
every oracle against the sf tables and flags HUGEINT / UHUGEINT / DECIMAL
result columns so the promotion can be cast away at the source.

Usage:
    python3 scripts/type_audit.py /tmp/oracle_sql.json /root/testdata/sf0.01
"""
import sys, json, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main(oracle_path: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    n_flag = 0
    for name in sorted(oracle):
        try:
            cols = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"ERROR {name}: {str(e).splitlines()[0]}")
            n_flag += 1
            continue
        hits = [(c, ty) for c, ty, *_ in cols if any(b in ty for b in BAD)]
        if hits:
            print(f"FLAG {name}: {hits}")
            n_flag += 1
    print(f"audited {len(oracle)} oracles, {n_flag} flagged")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
