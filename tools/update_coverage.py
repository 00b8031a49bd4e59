#!/usr/bin/env python3
"""Sync COVERAGE.md's Oracle column with a CORRECTNESS_r*.json.

The Oracle column previously drifted from the driver gate (round 3:
`x9_pack_shards` showed "✓" while CORRECTNESS_r03 was red). This script
makes the column DERIVED instead of hand-maintained: for every table row
whose "Query key(s)" cell names keys present in the correctness JSON,
the Oracle cell is rewritten from the per-query verdict — "✓" when every
named key has rows+schema+hash green, "✗ (<keys>)" otherwise. Rows whose
keys aren't in the JSON (staging/sink/streaming/library surfaces) are
left untouched.

Usage:
  python3 tools/update_coverage.py [--check] [CORRECTNESS.json]

With no file argument, the highest-numbered CORRECTNESS_r*.json in the
repo root is used. --check rewrites nothing and exits 1 if COVERAGE.md
disagrees with the JSON (run it in review to catch drift).
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COVERAGE = os.path.join(ROOT, "COVERAGE.md")


def load_correctness(path=None):
    if path is None:
        cands = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
        if not cands:
            sys.exit("no CORRECTNESS_r*.json found")
        path = cands[-1]
    with open(path) as f:
        data = json.load(f)
    verdict = {}
    for k, v in data.items():
        if v.get("oracle_present") is False:
            # query output exists but its oracle SQL is gone — a
            # distinct state (None) so the cell is flagged, never
            # silently left green
            verdict[k] = None
        else:
            verdict[k] = bool(v.get("rows_match")) and bool(v.get("schema_match")) \
                and bool(v.get("hash_match"))
    return path, verdict


def rewrite(lines, verdict):
    out, changes = [], []
    for line in lines:
        cells = line.split("|")
        # a coverage table row: | ID | Operator | Impl | Query key(s) | Oracle | Test |
        if len(cells) == 8 and line.lstrip().startswith("|"):
            keys = [k for k in re.findall(r"`([a-z0-9_]+)`", cells[4]) if k in verdict]
            if keys:
                bad = [k for k in keys if verdict[k] is False]
                noracle = [k for k in keys if verdict[k] is None]
                if bad:
                    want = " ✗ (" + ", ".join(bad) + ") "
                elif noracle:
                    want = " — (no oracle: " + ", ".join(noracle) + ") "
                else:
                    want = " ✓ "
                # preserve any parenthesized qualifier on a green cell
                # (e.g. "✓ (vs full-set exact SQL)") — only the mark is derived
                cur = cells[5]
                if not bad and not noracle and cur.strip().startswith("✓"):
                    want = cur
                if cur != want:
                    changes.append((keys, cur.strip(), want.strip()))
                    cells[5] = want
                    line = "|".join(cells)
        out.append(line)
    return out, changes


def main():
    check = "--check" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--check"]
    path, verdict = load_correctness(args[0] if args else None)
    with open(COVERAGE) as f:
        lines = f.read().splitlines()
    out, changes = rewrite(lines, verdict)
    for keys, cur, want in changes:
        print(f"{','.join(keys)}: {cur!r} -> {want!r}")
    if check:
        if changes:
            print(f"COVERAGE.md disagrees with {os.path.basename(path)}", file=sys.stderr)
            sys.exit(1)
        print(f"COVERAGE.md agrees with {os.path.basename(path)}")
        return
    if changes:
        with open(COVERAGE, "w") as f:
            f.write("\n".join(out) + "\n")
        print(f"rewrote {len(changes)} row(s) from {os.path.basename(path)}")
    else:
        print(f"no drift vs {os.path.basename(path)}")


if __name__ == "__main__":
    main()
