#!/usr/bin/env python3
"""Diff two graft plan dumps (graft.Explain output) structurally.

Usage: python3 tools/plandiff.py OLD.md NEW.md

For each query section (## name) present in both files, compares the
plan SIGNATURE — the multiset of structural lines that matter at scale:
Exchange / join operators / Scan+PushedFilters / Window / Generate /
InMemoryTableScan — and prints queries whose signature changed, with
the added/removed lines. Queries only in one file are listed as
added/removed. Cosmetic churn (expression ids #123, operator ids (42),
statistics) is stripped, so a reordered but structurally identical plan
reports clean.
"""
import re
import sys
from collections import Counter

SIG = re.compile(
    r"(Exchange|BroadcastExchange|SortMergeJoin|BroadcastHashJoin|"
    r"ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct|"
    r"Scan parquet|PushedFilters:|Window\b|WindowGroupLimit|Generate\b|"
    r"InMemoryTableScan|HashAggregate|ObjectHashAggregate|"
    r"SortAggregate)")
NOISE = [
    (re.compile(r"#\d+[L]?"), "#_"),          # expression ids
    (re.compile(r"\(\d+\)"), "(_)"),           # operator ids
    (re.compile(r"plan_id=\d+"), "plan_id=_"),
    (re.compile(r"Statistics\([^)]*\)"), ""),
    (re.compile(r"\s+"), " "),
]


def sections(path):
    out, name, buf = {}, None, []
    for line in open(path, encoding="utf-8"):
        if line.startswith("## "):
            if name:
                out[name] = buf
            name, buf = line[3:].strip(), []
        elif name:
            buf.append(line.rstrip("\n"))
    if name:
        out[name] = buf
    return out


def signature(lines):
    sig = Counter()
    for ln in lines:
        if not SIG.search(ln):
            continue
        for pat, rep in NOISE:
            ln = pat.sub(rep, ln)
        sig[ln.strip(" +-:*")] += 1
    return sig


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, new = sections(old_path), sections(new_path)
    changed = 0
    for q in sorted(set(old) | set(new)):
        if q not in old:
            print(f"ADDED   {q}")
            changed += 1
            continue
        if q not in new:
            print(f"REMOVED {q}")
            changed += 1
            continue
        so, sn = signature(old[q]), signature(new[q])
        if so == sn:
            continue
        changed += 1
        print(f"CHANGED {q}")
        for ln, n in sorted((sn - so).items()):
            print(f"  + {n}x {ln[:100]}")
        for ln, n in sorted((so - sn).items()):
            print(f"  - {n}x {ln[:100]}")
    print(f"\n{changed} of {len(set(old) | set(new))} queries changed "
          f"({old_path} -> {new_path})")
    sys.exit(0)


if __name__ == "__main__":
    main()
