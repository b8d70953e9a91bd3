#!/usr/bin/env python3
"""Adjudicate a driver-gate hash red from digest artifacts.

Usage: adjudicate.py <run_digests.json> [committed_digests.json]
         (second arg defaults to the repo's digests_sf001.json)

For every query present in either file, compares the canonical value
digests that graft.Verify emitted:
  EQUAL    — the engine dump is byte-stable across the two runs; if a
             compare still flagged this query, the divergence is on the
             compare side, not the engine's.
  DIFFERS  — first engine-side repro: the dump itself changed between
             runs (prints both digests + row counts).
  ONLY-*   — query present in one file only (registry drift or a
             subset run).
Exit code 1 iff any DIFFERS.
"""
import sys, json

def load(p):
    return json.load(open(p))

def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    run = load(sys.argv[1])
    ref = load(sys.argv[2] if len(sys.argv) > 2 else "digests_sf001.json")
    differs = 0
    for name in sorted(set(run) | set(ref)):
        a, b = run.get(name), ref.get(name)
        if a is None:
            print(f"ONLY-REF  {name}")
        elif b is None:
            print(f"ONLY-RUN  {name}")
        elif a["digest"] == b["digest"]:
            print(f"EQUAL     {name} ({a['rows']} rows)")
        else:
            differs += 1
            print(f"DIFFERS   {name} run={a['digest']} ({a['rows']} rows) "
                  f"ref={b['digest']} ({b['rows']} rows)")
    print(f"== {differs} differs")
    sys.exit(1 if differs else 0)

if __name__ == "__main__":
    main()
