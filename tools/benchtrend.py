#!/usr/bin/env python3
"""Compare two BENCH_DETAIL.json snapshots on SCALE-STABLE metrics.

Usage: python3 tools/benchtrend.py OLD.json NEW.json [--force-cpus]

Wall seconds on this host swing up to 2x with co-tenant noise (SURVEY
§8g); the signals that survive are per-query task metrics. This prints
queries whose shuffle bytes, task count, or input bytes moved beyond
tolerance (default 20% and an absolute floor so KB-sized jitter is
ignored), plus any query that started/stopped spilling — the deltas
that mean a PLAN changed, not the host.

Basis guard (r14 — the r13 verdict's finding #1): task counts AND
per-query byte totals depend on the parallelism basis (local[N] sets
shuffle partitions, and partial TopK/WindowGroupLimit emit k rows per
MAP PARTITION, so fewer partitions read as fake byte reductions). Two
runs whose `cpus` fields differ are NOT comparable; this tool refuses
them unless --force-cpus is given, and then stamps every line of
output with the basis mismatch.
"""
import json
import sys

REL_TOL = 0.20
ABS_FLOOR = 1 << 20  # 1 MiB: below this, byte deltas are jitter
METRICS = ["shuffle_read", "shuffle_write", "input", "tasks"]


def moved(old, new, rel=REL_TOL, floor=ABS_FLOOR):
    if old == new:
        return False
    if max(old, new) < floor:
        return False
    base = max(old, 1)
    return abs(new - old) / base > rel


def fmt_stage(s):
    spill = s.get("spill_mem", 0) + s.get("spill_disk", 0)
    sp = (f" SPILL(mem={s.get('spill_mem', 0)},"
          f"disk={s.get('spill_disk', 0)})" if spill else "")
    return (f"    {s.get('ms', 0):>6}ms t={s.get('tasks', 0):<3} "
            f"r={s.get('shuffle_read', 0)} w={s.get('shuffle_write', 0)} "
            f"in={s.get('input', 0)}{sp} {s.get('name', '')[:64]}")


def top_stages(doc, q, k=3):
    """The k slowest named stages of query q."""
    recs = doc.get("stages", {}).get(q, [])
    recs = sorted(recs, key=lambda s: -s.get("ms", 0))[:k]
    return [fmt_stage(s) for s in recs]


def spilling_stages(doc, q):
    """Every stage of query q that spilled, largest spill first —
    a spill regression should name its stage the way byte
    regressions do (r14)."""
    recs = [s for s in doc.get("stages", {}).get(q, [])
            if s.get("spill_mem", 0) + s.get("spill_disk", 0) > 0]
    recs.sort(key=lambda s: -(s.get("spill_mem", 0)
                              + s.get("spill_disk", 0)))
    return [fmt_stage(s) for s in recs]


def main():
    args = [a for a in sys.argv[1:] if a != "--force-cpus"]
    force = "--force-cpus" in sys.argv
    old_doc = json.load(open(args[0]))
    new_doc = json.load(open(args[1]))
    old_cpus = old_doc.get("cpus")
    new_cpus = new_doc.get("cpus")
    if old_cpus != new_cpus:
        msg = (f"BASIS MISMATCH: {args[0]} ran at cpus={old_cpus}, "
               f"{args[1]} at cpus={new_cpus} — task counts and "
               f"partial-TopK byte totals are NOT comparable across "
               f"parallelism bases.")
        if not force:
            print(msg)
            print("Refusing to compare. Rerun both at the same "
                  "SPARK_GRAFT_CPUS, or pass --force-cpus to override "
                  "(every line will carry the mismatch stamp).")
            sys.exit(2)
        print(msg + " (--force-cpus given; read nothing into task or "
              "byte deltas)")
    # r16: SF-basis guard — the standing trend now carries BOTH the
    # sf0.1 and the factor-10 sf1 snapshots, and a cross-SF compare is
    # meaningless the same way a cross-cpus one is. Paths differ per
    # host, so compare the basename only.
    import os
    old_sf = os.path.basename(str(old_doc.get("sf", "")).rstrip("/"))
    new_sf = os.path.basename(str(new_doc.get("sf", "")).rstrip("/"))
    if old_sf != new_sf:
        print(f"BASIS MISMATCH: {args[0]} ran on sf dir '{old_sf}', "
              f"{args[1]} on '{new_sf}' — refusing the cross-SF "
              f"compare.")
        sys.exit(2)
    stamp = (f" [CPUS {old_cpus}->{new_cpus}]"
             if old_cpus != new_cpus else "")
    old, new = old_doc["metrics"], new_doc["metrics"]
    changed = 0
    for q in sorted(set(old) | set(new)):
        if q not in old:
            print(f"ADDED   {q}: {new[q]}{stamp}")
            for ln in top_stages(new_doc, q):
                print(ln)
            changed += 1
            continue
        if q not in new:
            print(f"REMOVED {q}")
            changed += 1
            continue
        o, n = old[q], new[q]
        lines = []
        for m in METRICS:
            floor = 8 if m == "tasks" else ABS_FLOOR
            if moved(o.get(m, 0), n.get(m, 0), floor=floor):
                lines.append(f"  {m}: {o.get(m, 0)} -> {n.get(m, 0)}")
        o_spill = o.get("spill_mem", 0) + o.get("spill_disk", 0)
        n_spill = n.get("spill_mem", 0) + n.get("spill_disk", 0)
        spill_moved = (o_spill == 0) != (n_spill == 0) or \
            moved(o_spill, n_spill)
        if spill_moved:
            lines.append(f"  SPILL: {o_spill} -> {n_spill}")
        if lines:
            changed += 1
            print(f"CHANGED {q}{stamp}")
            for ln in lines:
                print(ln)
            if spill_moved and n_spill > 0:
                # name the spilling stage(s) directly — guessing the
                # operator from stage names wasted probe runs in r13
                print("  spilling stages now:")
                for ln in spilling_stages(new_doc, q):
                    print(ln)
            if spill_moved and o_spill > 0 and n_spill == 0:
                print("  stages that no longer spill (old side):")
                for ln in spilling_stages(old_doc, q):
                    print(ln)
            # the stage-level evidence behind the byte/task move: the
            # slowest named stages on each side, so the adjudication
            # (plan change vs co-tenant noise) is mechanical
            print("  stages before:")
            for ln in top_stages(old_doc, q):
                print(ln)
            print("  stages after:")
            for ln in top_stages(new_doc, q):
                print(ln)
    print(f"\n{changed} of {len(set(old) | set(new))} queries moved "
          f"beyond noise ({args[0]} -> {args[1]}){stamp}")


if __name__ == "__main__":
    main()
