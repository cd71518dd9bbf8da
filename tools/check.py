#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [jsonOut]
Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle in DuckDB over the sfDir
tables, sorts columns by name and rows by value, and diffs exactly.
With jsonOut set, also writes a machine-readable result
({sfdir, total, passed, failed:{name:reason}, queries:{name:{pass,rows}}})
— committed per round as CHECK_r{N}.json so an empty driver-side
CORRECTNESS artifact (the r9 incident) is distinguishable from a
real regression without a judge re-running the whole gate.
"""
import sys, json, glob, math, os, threading
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
jsonout = sys.argv[3] if len(sys.argv) > 3 else None
# Per-query watchdog for the upper-SF gates (GRAFT_CHECK_TIMEOUT_S,
# unset = no limit): a runaway oracle (the r10 betweenness-CTE /
# r11 kcore-inlining class) is interrupted and recorded as a
# "timeout" failure to adjudicate, instead of wedging the whole gate.
timeout_s = float(os.environ.get("GRAFT_CHECK_TIMEOUT_S", "0")) or None

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    # driver testdata ships single-file tables; the sf1 probe dirs are
    # Spark-written directories — bind whichever shape is present
    path = f"{sfdir}/{t}.parquet"
    if os.path.isdir(path):
        path += "/*.parquet"
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
detail = {}
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        detail[name] = {"pass": False, "reason": "no spark output"}
        print(f"FAIL {name}: no spark output written")
        continue
    timer = None
    timed_out = []
    # `done` guards the watchdog race: the timer can fire after the
    # guarded query completes but before timer.cancel(); an interrupt
    # landing then would poison the NEXT query on the shared
    # connection and be misreported as a real failure for that key.
    done = threading.Event()
    if timeout_s:
        def _interrupt():
            if done.is_set():
                return
            timed_out.append(True)
            con.interrupt()
        timer = threading.Timer(timeout_s, _interrupt)
        timer.start()
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        want = con.execute(sql).fetchdf()
        done.set()
    except Exception as e:
        done.set()
        reason = f"timeout>{timeout_s}s" if timed_out else str(e)
        fails.append((name, reason))
        detail[name] = {"pass": False, "reason": reason[:200]}
        print(f"FAIL {name}: {reason}")
        continue
    finally:
        if timer:
            timer.cancel()
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        fails.append((name, "schema"))
        detail[name] = {"pass": False, "reason": "schema"}
        print(f"FAIL {name}: columns spark={gc} oracle={wc}")
        continue
    got, want = got[gc], want[wc]
    if len(got) != len(want):
        fails.append((name, "rowcount"))
        detail[name] = {"pass": False, "reason": "rowcount"}
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
        continue

    def norm(df):
        rows = []
        for row in df.itertuples(index=False):
            out = []
            for v in row:
                if isinstance(v, float):
                    if math.isnan(v):
                        out.append("NaN")
                    else:
                        # + 0.0 canonicalizes IEEE signed zero: engines
                        # legitimately disagree on the sign bit of a
                        # rounded ~0 float (summation order), and repr
                        # would turn that into a spurious value diff
                        out.append(repr(round(v, 9) + 0.0))
                else:
                    out.append(str(v))
            rows.append(tuple(out))
        return sorted(rows)

    g, w = norm(got), norm(want)
    if g != w:
        bad = [(a, b) for a, b in zip(g, w) if a != b][:3]
        fails.append((name, "values"))
        detail[name] = {"pass": False, "reason": "values"}
        print(f"FAIL {name}: value mismatch, first diffs: {bad}")
    else:
        detail[name] = {"pass": True, "rows": len(got)}
        print(f"OK   {name}: {len(got)} rows")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
if jsonout:
    with open(jsonout, "w") as f:
        json.dump({"sfdir": sfdir, "total": len(oracle),
                   "passed": len(oracle) - len(fails),
                   "failed": {n: r for n, r in fails},
                   "queries": detail}, f, indent=1, sort_keys=True)
    print(f"wrote {jsonout}")
sys.exit(1 if fails else 0)
