#!/usr/bin/env python3
"""oracle_check with per-query wall-time printing (line-buffered) — for
long scale-dir runs where knowing WHICH oracle SQL is slow matters.
Comparison semantics (canon/table_digest/connect) are imported from
oracle_check.py so the two gates can never silently disagree.
Usage: oracle_check_live.py <sfdir> <verify_outdir> [threads]"""
import json, sys, time, os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import canon, table_digest, connect  # noqa: E402


def main(sfdir, outdir, threads=None):
    con = connect(sfdir)
    if threads:
        con.execute(f"SET threads={threads}")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    np = nf = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{outdir}/{name}"):
            continue
        t0 = time.time()
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            gcols = [c.lower() for c in got.columns]
            grows = got.fetchall()
            want = con.sql(sql)
            wcols = [c.lower() for c in want.columns]
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e} [{time.time() - t0:.1f}s]", flush=True)
            nf += 1
            continue
        ok = (sorted(gcols) == sorted(wcols) and len(grows) == len(wrows)
              and table_digest(gcols, grows) == table_digest(wcols, wrows))
        print(f"{'PASS' if ok else 'FAIL'} {name} ({len(grows)} rows) "
              f"[{time.time() - t0:.1f}s]", flush=True)
        np += 1 if ok else 0
        nf += 0 if ok else 1
    print(f"== {np} pass, {nf} fail ==", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
