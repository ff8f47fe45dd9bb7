#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json's SQL in DuckDB with views named after the
testdata tables. Compares: columns sorted by name, rows sorted, values
stringified (floats rounded to 9 significant-ish digits for reporting, but
exact mismatches are flagged too).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)  # exact double repr
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}"); n_fail += 1; continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        ec, gc = sorted(exp.columns), sorted(got.columns)
        if [c.lower() for c in ec] != [c.lower() for c in gc]:
            print(f"FAIL {name}: columns differ: oracle={ec} spark={gc}"); n_fail += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: row count: oracle={len(exp)} spark={len(got)}"); n_fail += 1; continue
        er = sorted(tuple(canon(v) for v in row) for row in exp[ec].itertuples(index=False, name=None))
        gr = sorted(tuple(canon(v) for v in row) for row in got[gc].itertuples(index=False, name=None))
        if er != gr:
            bad = [(a, b) for a, b in zip(er, gr) if a != b][:3]
            print(f"FAIL {name}: {sum(1 for a,b in zip(er,gr) if a!=b)} differing rows, e.g. {bad}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
