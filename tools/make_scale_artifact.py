#!/usr/bin/env python3
"""Build a scale/CORRECTNESS_sf*.json artifact from an oracle_check_live run.

Usage: make_scale_artifact.py <live_checker_log> <out_json> <note> [exclusions_json]

Parses the live checker's per-query lines:
    PASS <name> (<rows> rows) [<t>s]
    FAIL <name> ...
and writes {note, result, queries: {name: {pass, rows, oracle_sec}},
excluded: {...}}. The exclusions_json (a file) maps query name -> the named
reason it is outside the spot oracle (VERDICT r9 #5: every heavy-family
query must be in the artifact or excluded with a named reason).
"""
import json, re, sys


def main(log_path, out_path, note, excl_path=None):
    queries = {}
    n_pass = n_fail = 0
    for line in open(log_path):
        m = re.match(r"(PASS|FAIL) (\S+)(?: \((\d+) rows\))?.*\[([0-9.]+)s\]", line)
        if not m:
            continue
        ok, name, rows, sec = m.group(1) == "PASS", m.group(2), m.group(3), m.group(4)
        queries[name] = {"pass": ok, "rows": int(rows) if rows else None,
                         "oracle_sec": float(sec)}
        n_pass += 1 if ok else 0
        n_fail += 0 if ok else 1
    out = {
        "note": note,
        "result": f"{n_pass} pass, {n_fail} fail",
        "queries": dict(sorted(queries.items())),
    }
    if excl_path:
        out["excluded"] = json.load(open(excl_path))
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: {out['result']}, "
          f"{len(out.get('excluded', {}))} named exclusions")


if __name__ == "__main__":
    main(*sys.argv[1:])
