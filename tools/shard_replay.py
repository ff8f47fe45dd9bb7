#!/usr/bin/env python3
"""Shard the slow sf0.1 DuckDB oracle replay across N processes.

Usage:
  python3 tools/shard_replay.py prepare <verifyOutDir> <nShards>
      Creates <verifyOutDir>_shard{i} dirs, each holding symlinks to a
      1/N slice of the result dirs plus a filtered oracle_sql.json.
  python3 tools/shard_replay.py run <sfDir> <verifyOutDir> <nShards>
      Launches N check_oracle.py processes (one per shard), waits, and
      concatenates their logs to <verifyOutDir>_replay.log.

After `run`, produce the single merged artifact with:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir> \
      --resume <verifyOutDir>_replay.log --json CORRECTNESS_sf01_rN.json
(--resume trusts only PASS rows newer than the oracle/results; any
shard failure re-runs in the merge pass and still fails the artifact.)

The replay is DuckDB-bound (the 128-minhash and brute-force pair
oracles), ~3–4 h serial at 254 keys; 6 shards on a 32-thread host cut
it to well under an hour without contending a concurrent Spark job too
hard — leave headroom if a bench is running (memory-file rule: never
bench against a live replay).
"""
import sys, os, json, glob, subprocess


def prepare(out_dir, n):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracle)
    for i in range(n):
        sdir = f"{out_dir}_shard{i}"
        os.makedirs(sdir, exist_ok=True)
        shard = {k: oracle[k] for j, k in enumerate(names) if j % n == i}
        json.dump(shard, open(f"{sdir}/oracle_sql.json", "w"))
        for k in shard:
            dst = f"{sdir}/{k}"
            if not os.path.islink(dst) and not os.path.exists(dst):
                os.symlink(os.path.abspath(f"{out_dir}/{k}"), dst)
        print(f"shard {i}: {len(shard)} keys -> {sdir}")


def run(sf_dir, out_dir, n):
    procs = []
    for i in range(n):
        sdir = f"{out_dir}_shard{i}"
        log = open(f"{sdir}/replay.log", "w")
        procs.append((i, subprocess.Popen(
            [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracle.py"),
             sf_dir, sdir],
            stdout=log, stderr=subprocess.STDOUT), log))
    rc = 0
    for i, p, log in procs:
        p.wait(); log.close()
        print(f"shard {i}: rc={p.returncode}")
        rc |= p.returncode
    merged = f"{out_dir}_replay.log"
    with open(merged, "w") as m:
        for i in range(n):
            m.write(open(f"{out_dir}_shard{i}/replay.log").read())
    print(f"merged log: {merged} (rc={rc})")
    return rc


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "prepare":
        prepare(sys.argv[2], int(sys.argv[3]))
    elif cmd == "run":
        sys.exit(run(sys.argv[2], sys.argv[3], int(sys.argv[4])))
    else:
        sys.exit(f"unknown command {cmd}")
