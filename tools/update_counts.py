#!/usr/bin/env python3
"""Regenerate the hand-editable query-count stamps from harness output.

Usage: python3 tools/update_counts.py [oracle_sql.json]

Source of truth, in order of preference:
  1. an explicit oracle_sql.json path (dumped by `runMain graft.Verify`,
     one entry per SparkEntry query — reflects the CURRENT code);
  2. the newest CORRECTNESS_r*.json in the repo root (last driver round).

Rewrites in place:
  - README.md: the "driver contract: N named queries" line;
  - COVERAGE.md: the "N queries" total in its header line, if present.

Idempotent; prints what changed. One command — no hand-edited counts.
"""
import json, re, sys, glob, os

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if len(sys.argv) > 1:
    src = sys.argv[1]
else:
    cands = sorted(glob.glob(f"{root}/CORRECTNESS_r*.json"))
    if not cands:
        sys.exit("no oracle_sql.json given and no CORRECTNESS_r*.json found")
    src = cands[-1]

n = len(json.load(open(src)))
print(f"query count {n} (from {os.path.relpath(src, root)})")


def rewrite(path, pattern, repl):
    text = open(path).read()
    new, cnt = re.subn(pattern, repl, text)
    if cnt and new != text:
        open(path, "w").write(new)
        print(f"updated {os.path.basename(path)} ({cnt} stamp)")
    elif cnt:
        print(f"{os.path.basename(path)} already current")
    else:
        print(f"WARNING: no count stamp matched in {os.path.basename(path)}")


rewrite(f"{root}/README.md",
        r"driver contract: \d+ named queries",
        f"driver contract: {n} named queries")
rewrite(f"{root}/COVERAGE.md",
        r"\b\d+ harness queries\b",
        f"{n} harness queries")
