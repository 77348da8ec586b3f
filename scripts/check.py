#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff. Usage:
    python3 scripts/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            # retry with tolerance to show severity
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              check_exact=False, rtol=1e-9)
                print(f"WARN {name}: exact mismatch but within 1e-9 rtol")
                n_fail += 1
            except AssertionError:
                print(f"FAIL {name}: {str(ex)[:400]}")
                n_fail += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(d)
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
            print(f"{'ROWS' if n > 0 else 'FAIL'} {name}: {n} rows (no oracle)")
            if n == 0:
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
