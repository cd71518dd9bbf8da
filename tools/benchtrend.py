#!/usr/bin/env python3
"""Compare two BENCH_DETAIL.json snapshots on SCALE-STABLE metrics.

Usage: python3 tools/benchtrend.py OLD.json NEW.json

Wall seconds on this host swing up to 2x with co-tenant noise (SURVEY
§8g); the signals that survive are per-query task metrics. This prints
queries whose shuffle bytes, task count, or input bytes moved beyond
tolerance (default 20% and an absolute floor so KB-sized jitter is
ignored), plus any query that started/stopped spilling — the deltas
that mean a PLAN changed, not the host.
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


def top_stages(doc, q, k=3):
    """The k slowest named stages of query q (ms, tasks, name)."""
    recs = doc.get("stages", {}).get(q, [])
    recs = sorted(recs, key=lambda s: -s.get("ms", 0))[:k]
    return [f"    {s.get('ms', 0):>6}ms t={s.get('tasks', 0):<3} "
            f"r={s.get('shuffle_read', 0)} w={s.get('shuffle_write', 0)} "
            f"{s.get('name', '')[:64]}" for s in recs]


def main():
    old_doc = json.load(open(sys.argv[1]))
    new_doc = json.load(open(sys.argv[2]))
    old, new = old_doc["metrics"], new_doc["metrics"]
    changed = 0
    for q in sorted(set(old) | set(new)):
        if q not in old:
            print(f"ADDED   {q}: {new[q]}")
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
        if (o_spill == 0) != (n_spill == 0):
            lines.append(f"  SPILL: {o_spill} -> {n_spill}")
        if lines:
            changed += 1
            print(f"CHANGED {q}")
            for ln in lines:
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
          f"beyond noise ({sys.argv[1]} -> {sys.argv[2]})")


if __name__ == "__main__":
    main()
