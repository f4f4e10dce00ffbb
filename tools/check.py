#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify's
parquet dumps against the DuckDB oracle SQL, column-name-sorted,
row-sorted, exact values. Usage: check.py <sfDir> <outDir>"""
import json, sys, math
import decimal
import duckdb
import pyarrow.parquet as pq
import pathlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    r.append("NaN")
                else:
                    r.append(repr(v))
            elif isinstance(v, decimal.Decimal):
                # keep the type tag: the driver's value-canonical hash
                # distinguishes decimal128 from int64 even when the
                # numeric value is identical (the r7 c8/g1 failure mode)
                r.append(f"Decimal:{v}")
            else:
                r.append(str(v))
        out.append(tuple(r))
    out.sort()
    return out

def main(sf_dir, out_dir):
    out_dir = pathlib.Path(out_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = n_noora = 0
    # an oracle entry whose query never dumped (crash in Verify) must
    # fail loudly, not vanish — the driver counts it as a failure too
    dumped = {d.name for d in out_dir.iterdir() if d.is_dir()}
    for name in sorted(set(oracle) - dumped):
        print(f"FAIL  {name}: oracle registered but no output dumped")
        n_fail += 1
    for qdir in sorted(out_dir.iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        files = list(qdir.glob("*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        cols = sorted(tbl.column_names)
        spark_rows = canon(zip(*[tbl.column(c).to_pylist() for c in cols])) if tbl.num_rows else []
        if name not in oracle:
            print(f"ROWS  {name}: {tbl.num_rows} rows (no oracle)")
            n_noora += 1
            continue
        try:
            # fetch via Arrow so type rendering matches the driver's
            # canonicalization: DuckDB HUGEINT arrives as
            # decimal128(38,0) (Decimal in pylist), not a Python int —
            # fetchall() would mask exactly that class of mismatch.
            dtbl = con.execute(oracle[name]).fetch_arrow_table()
            names = dtbl.column_names
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}")
            n_fail += 1
            continue
        dcols = sorted(names)
        duck_rows = canon(zip(*[dtbl.column(c).to_pylist() for c in dcols])) if dtbl.num_rows else []
        if dcols != cols:
            print(f"FAIL  {name}: columns spark={cols} duck={dcols}")
            n_fail += 1
        elif spark_rows == duck_rows:
            print(f"PASS  {name}: {len(spark_rows)} rows")
            n_pass += 1
        else:
            print(f"FAIL  {name}: spark {len(spark_rows)} rows vs duck {len(duck_rows)}")
            sd, dd = set(spark_rows), set(duck_rows)
            only_s = list(sd - dd)[:3]
            only_d = list(dd - sd)[:3]
            for r in only_s:
                print(f"      spark-only: {r}")
            for r in only_d:
                print(f"      duck-only:  {r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
