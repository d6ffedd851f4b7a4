#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

Reads each <verify_out_dir>/<name> parquet result dumped by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB with views
named after the test tables, and compares: column names (sorted), row
count, and cell values (rows sorted, columns sorted by name).

Dev-only tool — not part of the shipped library (the driver has its own
checker; this mirrors it so mismatches surface before commit).
"""
import sys, json, glob, os, math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # tolerate last-ulp float noise between engines
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_key(tbl):
    cols = sorted(tbl.column_names)
    data = tbl.select(cols).to_pylist()
    rows = sorted(tuple(norm(r[c]) for c in cols) for r in data)
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for name in TABLES:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for d in sorted(glob.glob(f"{out_dir}/*")):
        qname = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        got = pq.read_table(glob.glob(f"{d}/*.parquet")[0])
        if qname not in oracle:
            results[qname] = f"NO-ORACLE rows={got.num_rows}"
            continue
        try:
            want = con.execute(oracle[qname]).arrow()
        except Exception as e:
            results[qname] = f"ORACLE-ERROR {e}"
            continue
        gc, gr = table_key(got)
        wc, wr = table_key(want)
        # Driver-hash hazard guard (round-9 root cause): DuckDB
        # sum(BIGINT) returns HUGEINT -> arrow decimal128(38,0), which
        # the driver's type-sensitive hasher normalizes differently
        # from int64 even at equal value. str()-normalization below
        # would hide it, so fail loudly on any decimal output column.
        dec = [f.name for f in want.schema
               if pa.types.is_decimal(f.type)]
        if dec:
            results[qname] = (f"TYPE-HAZARD oracle emits decimal "
                              f"(HUGEINT?) columns {dec} — CAST to "
                              f"BIGINT in the final SELECT")
        elif gc != wc:
            results[qname] = f"COLS-MISMATCH spark={gc} duckdb={wc}"
        elif len(gr) != len(wr):
            results[qname] = f"ROWS-MISMATCH spark={len(gr)} duckdb={len(wr)}"
        elif gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            results[qname] = (f"VALUES-MISMATCH first at sorted row {bad}: "
                              f"spark={gr[bad]} duckdb={wr[bad]}")
        else:
            results[qname] = f"OK rows={len(gr)}"
    width = max(len(k) for k in results) if results else 0
    nfail = 0
    for k in sorted(results):
        status = results[k]
        if not status.startswith(("OK", "NO-ORACLE")):
            nfail += 1
        print(f"{k:<{width}}  {status}")
    print(f"\n{len(results)} queries, {nfail} failing")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
