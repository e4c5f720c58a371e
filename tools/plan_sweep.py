#!/usr/bin/env python3
"""Split a graft.Explain all-queries log into per-query plan dumps and
emit a grep-level anti-pattern sweep (SortMergeJoin / BNLJ /
CartesianProduct / scans) — the r21 full-board audit artifact.

Usage: plan_sweep.py <explain_log> <outdir> <sweep_md>
"""
import re, sys, os

log = open(sys.argv[1]).read()
outdir, sweep_md = sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
parts = re.split(r"\n========== (\S+) ==========\n", log)
rows = []
for i in range(1, len(parts) - 1, 2):
    name, body = parts[i], re.sub(r"\[success\].*", "", parts[i + 1])
    open(os.path.join(outdir, f"{name}.txt"), "w").write(body)
    def c(pat):
        return len(re.findall(pat, body))
    rows.append((name, c(r"\bSortMergeJoin\b"), c(r"BroadcastNestedLoopJoin"),
                 c(r"CartesianProduct"), c(r"\bExchange\b"),
                 c(r"Scan parquet"), c(r"PushedFilters: \[[^\]]"),
                 c(r"Scan ExistingRDD")))
with open(sweep_md, "w") as f:
    f.write("| query | SMJ | BNLJ | Cartesian | Exchange | parquet scans | pushed-filter scans | rdd scans |\n")
    f.write("|---|---|---|---|---|---|---|---|\n")
    for r in sorted(rows):
        f.write("| " + " | ".join(str(x) for x in r) + " |\n")
print(f"{len(rows)} queries -> {outdir}, sweep -> {sweep_md}")
hits = [(n, s, b, cz) for n, s, b, cz, *_ in rows if s or b or cz]
for n, s, b, cz in hits:
    print(f"HIT {n}: SMJ={s} BNLJ={b} Cartesian={cz}")
