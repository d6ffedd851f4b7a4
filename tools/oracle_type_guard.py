#!/usr/bin/env python3
"""Oracle output-type guard (round-9 judge root cause).

Usage: python3 tools/oracle_type_guard.py <sf_dir> <oracle_sql.json>

DESCRIBEs every oracle query through DuckDB against views over the
test parquet tables and FAILS if any final output column is a
HUGEINT/DECIMAL type. DuckDB's sum(BIGINT) returns HUGEINT, which
lands in arrow as decimal128(38,0); the driver's hasher normalizes a
Decimal cell differently from an int64 of equal value, so an uncast
sum in a final oracle projection is a guaranteed hash-red gate even
when every value matches. Rule enforced here: no uncast sum() (incl.
windowed sums surfacing via max()/min()) may reach a final oracle
projection — CAST(... AS BIGINT) it.

Dev-only tool — not part of the shipped library.
"""
import sys, json, os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for name in TABLES:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_json))
    nfail = 0
    for qname in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE ({oracle[qname]})").fetchall()
        except Exception as e:
            print(f"{qname}: DESCRIBE-ERROR {e}")
            nfail += 1
            continue
        hazards = [(c, t) for c, t, *_ in desc
                   if any(b in t.upper() for b in BAD)]
        if hazards:
            print(f"{qname}: TYPE-HAZARD {hazards} — CAST to BIGINT "
                  f"in the final SELECT")
            nfail += 1
    print(f"{len(oracle)} oracles checked, {nfail} with type hazards")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
