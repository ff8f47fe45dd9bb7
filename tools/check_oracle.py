#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--json <path>]

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json's SQL in DuckDB with views named after the
testdata tables. Compares: columns sorted by name, rows sorted, values
stringified (floats rounded to 9 significant-ish digits for reporting, but
exact mismatches are flagged too).

With --json <path>, also writes a machine-readable per-query artifact
(round-17 verdict item 3: the three-scale correctness pedigree must be
committed JSON a future round can diff, not SURVEY prose) — one entry per
query with status/rows/reason, plus the git HEAD and timestamp.
"""
import sys, json, glob, math, subprocess, datetime
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

def main(sf_dir, out_dir, json_path=None, resume_log=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    # --resume <prior log>: trust that log's PASS lines and skip those
    # keys (the multi-hour sf0.1 replay has no other checkpointing; a
    # killed run would otherwise restart from zero). Only PASS rows are
    # trusted — anything else re-runs.
    if resume_log:
        import re, os
        if os.path.exists(resume_log):
            for line in open(resume_log):
                m = re.match(r"PASS (\S+) \((\d+) rows\)", line.strip())
                if m and m.group(1) in oracle:
                    results[m.group(1)] = {"status": "pass",
                                           "rows": int(m.group(2)),
                                           "resumed": True}
                    n_pass += 1
            print(f"resumed {n_pass} PASS results from {resume_log}")
    def fail(name, reason):
        nonlocal n_fail
        print(f"FAIL {name}: {reason}")
        results[name] = {"status": "fail", "reason": reason[:300]}
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        if name in results:
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            fail(name, f"oracle SQL error: {str(e)[:300]}"); continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fail(name, "no spark output"); continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        ec, gc = sorted(exp.columns), sorted(got.columns)
        if [c.lower() for c in ec] != [c.lower() for c in gc]:
            fail(name, f"columns differ: oracle={ec} spark={gc}"); continue
        if len(exp) != len(got):
            fail(name, f"row count: oracle={len(exp)} spark={len(got)}"); continue
        er = sorted(tuple(canon(v) for v in row) for row in exp[ec].itertuples(index=False, name=None))
        gr = sorted(tuple(canon(v) for v in row) for row in got[gc].itertuples(index=False, name=None))
        if er != gr:
            bad = [(a, b) for a, b in zip(er, gr) if a != b][:3]
            fail(name, f"{sum(1 for a,b in zip(er,gr) if a!=b)} differing rows, e.g. {bad}")
            continue
        print(f"PASS {name} ({len(got)} rows)")
        results[name] = {"status": "pass", "rows": len(got)}
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if json_path:
        try:
            head = subprocess.run(["git", "rev-parse", "HEAD"],
                                  capture_output=True, text=True).stdout.strip()
        except Exception:
            head = "unknown"
        artifact = {"sf_dir": sf_dir, "git_head": head,
                    "at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
                    "n_pass": n_pass, "n_fail": n_fail,
                    "check": "rows+schema+hash vs DuckDB oracle",
                    "results": results}
        with open(json_path, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    jp = rl = None
    args = sys.argv[1:]
    if "--json" in args:
        i = args.index("--json")
        jp = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--resume" in args:
        i = args.index("--resume")
        rl = args[i + 1]
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], jp, rl))
