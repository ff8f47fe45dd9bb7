#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--json <path>]

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json's SQL in DuckDB with views named after the
testdata tables. Compares: columns sorted by name, rows sorted, values
stringified PER TYPE.

TYPE-STRICT (round-18 verdict item 2): the Spark side is read with
pyarrow, NOT through DuckDB's pandas coercion — a DECIMAL(33,11) result
column stays decimal.Decimal and stringifies as '52840.43500000000',
which fails against an oracle DOUBLE's '52840.435' exactly the way the
driver's hash does. The old fetchdf() path converted decimals to float64
at read time, which is how a decimal/double drift in sql_median_by_group
passed three local sweeps and then failed the driver. The same applies
to date-vs-timestamp and int-vs-float drifts: each stringifies
distinctly, so a typed divergence fails HERE first.

Timezone note: Spark writes timestamps as timestamp[us, tz=UTC] parquet
while DuckDB returns naive datetimes for TIMESTAMP — that is a storage
convention, not a result-type divergence, so tz-aware datetimes are
normalized to naive UTC before stringifying (date vs timestamp still
differ: '2020-01-02' vs '2020-01-02 00:00:00').

With --json <path>, also writes a machine-readable per-query artifact
(round-17 verdict item 3: the three-scale correctness pedigree must be
committed JSON a future round can diff, not SURVEY prose) — one entry per
query with status/rows/reason, plus the git HEAD and timestamp.

--resume <prior log> provenance (round-18 advice): a PASS line is only
trusted if the prior log is NEWER than both oracle_sql.json and that
key's result parquet — a resumed row may never predate the outputs it
claims to have verified. The resume log's path and mtime are recorded in
the JSON artifact so the pedigree says what was replayed vs re-run.
"""
import sys, json, glob, math, os, subprocess, datetime, decimal
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)  # exact double repr
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)  # keeps scale: DECIMAL(33,11) shows 11 digits
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:  # normalize storage tz, keep the type
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, (list, tuple)): return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bool): return "true" if v else "false"
    return str(v)

def spark_rows(files):
    """Read Spark's result parquet via pyarrow — types survive exactly as
    written (decimal128 -> Decimal, int32/int64 -> int, float -> float)."""
    tbl = pq.ParquetDataset(files).read()
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(col[i] for col in data) for i in range(tbl.num_rows)]

def main(sf_dir, out_dir, json_path=None, resume_log=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle_path = f"{out_dir}/oracle_sql.json"
    oracle = json.load(open(oracle_path))
    n_pass = n_fail = 0
    results = {}
    resume_info = None
    # --resume <prior log>: trust that log's PASS lines and skip those
    # keys (the multi-hour sf0.1 replay has no other checkpointing; a
    # killed run would otherwise restart from zero). Only PASS rows are
    # trusted, and only when the log postdates oracle_sql.json and the
    # key's parquet output — stale rows re-run.
    if resume_log and os.path.exists(resume_log):
        import re
        log_mtime = os.path.getmtime(resume_log)
        resume_info = {"log": resume_log,
                       "log_mtime": datetime.datetime.fromtimestamp(
                           log_mtime, datetime.timezone.utc).isoformat()}
        if os.path.getmtime(oracle_path) > log_mtime:
            print(f"resume REFUSED: {oracle_path} is newer than {resume_log}")
            resume_info["refused"] = "oracle_sql.json newer than log"
        else:
            stale = 0
            for line in open(resume_log):
                m = re.match(r"PASS (\S+) \((\d+) rows\)", line.strip())
                if not (m and m.group(1) in oracle):
                    continue
                outs = glob.glob(f"{out_dir}/{m.group(1)}/*.parquet")
                if outs and max(os.path.getmtime(f) for f in outs) > log_mtime:
                    stale += 1; continue  # output rewritten since the log
                results[m.group(1)] = {"status": "pass",
                                       "rows": int(m.group(2)),
                                       "resumed": True}
                n_pass += 1
            print(f"resumed {n_pass} PASS results from {resume_log}"
                  + (f" ({stale} stale skipped)" if stale else ""))
    def fail(name, reason):
        nonlocal n_fail
        print(f"FAIL {name}: {reason}")
        results[name] = {"status": "fail", "reason": reason[:300]}
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        if name in results:
            continue
        try:
            cur = con.execute(sql)
            ecols = [d[0] for d in cur.description]
            edata = cur.fetchall()  # native python: Decimal stays Decimal
        except Exception as e:
            fail(name, f"oracle SQL error: {str(e)[:300]}"); continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fail(name, "no spark output"); continue
        try:
            gc, grows = spark_rows(files)
        except Exception as e:
            fail(name, f"spark parquet read error: {str(e)[:300]}"); continue
        ec = sorted(ecols)
        if [c.lower() for c in ec] != [c.lower() for c in gc]:
            fail(name, f"columns differ: oracle={ec} spark={gc}"); continue
        if len(edata) != len(grows):
            fail(name, f"row count: oracle={len(edata)} spark={len(grows)}"); continue
        order = [ecols.index(c) for c in ec]
        er = sorted(tuple(canon(row[i]) for i in order) for row in edata)
        gr = sorted(tuple(canon(v) for v in row) for row in grows)
        if er != gr:
            bad = [(a, b) for a, b in zip(er, gr) if a != b][:3]
            fail(name, f"{sum(1 for a,b in zip(er,gr) if a!=b)} differing rows, e.g. {bad}")
            continue
        print(f"PASS {name} ({len(grows)} rows)")
        results[name] = {"status": "pass", "rows": len(grows)}
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
                    "check": "rows+schema+typed-hash vs DuckDB oracle",
                    "results": results}
        if resume_info:
            artifact["resume"] = resume_info
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
