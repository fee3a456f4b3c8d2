#!/usr/bin/env python3
"""oracle_check with per-query wall-time printing (line-buffered) — for
long scale-dir runs where knowing WHICH oracle SQL is slow matters.
Usage: oracle_check_live.py <sfdir> <verify_outdir> [threads]"""
import json, sys, time, os, math, hashlib
import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if hasattr(v, "tzinfo") and getattr(v, "tzinfo", None) is not None:
        import datetime
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sfdir, outdir, threads=None):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    if threads:
        con.execute(f"SET threads={threads}")
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
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
              and digest(gcols, grows) == digest(wcols, wrows))
        print(f"{'PASS' if ok else 'FAIL'} {name} ({len(grows)} rows) "
              f"[{time.time() - t0:.1f}s]", flush=True)
        np += 1 if ok else 0
        nf += 0 if ok else 1
    print(f"== {np} pass, {nf} fail ==", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
