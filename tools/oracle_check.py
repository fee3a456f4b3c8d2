#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfdir> <verify_outdir>

Loads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same parquet tables, then
compares: schema (column names sorted), row count, and a hash of all values
(columns sorted by name, rows sorted). Prints per-query PASS/FAIL.
"""
import json, sys, math, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if hasattr(v, "tzinfo") and getattr(v, "tzinfo", None) is not None:
        # normalize tz-aware timestamps to naive UTC for comparison
        import datetime
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_digest(cols, rows):
    # sort columns by name, then rows lexicographically
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sfdir, outdir):
    con = duckdb.connect()
    # Spark side is pinned UTC; pin DuckDB too or timestamp-emitting queries
    # (to_timestamp casts, TIMESTAMPTZ parquet reads) become host-TZ-dependent
    con.execute("SET TimeZone='UTC'")
    import os
    for t in TABLES:
        # driver testdata ships single parquet FILES; GenScale-produced
        # scale dirs are Spark parquet DIRECTORIES — glob those
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        import os
        if not os.path.isdir(f"{outdir}/{name}"):
            # not dumped (graft.Verify was run with a name-prefix filter)
            n_skip += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            gcols = [c.lower() for c in got.columns]
            grows = got.fetchall()
            want = con.sql(sql)
            wcols = [c.lower() for c in want.columns]
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
        elif len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}")
            n_fail += 1
        elif table_digest(gcols, grows) != table_digest(wcols, wrows):
            print(f"FAIL {name}: value hash mismatch ({len(grows)} rows)")
            # show first differing row for debugging
            order_g = sorted(range(len(gcols)), key=lambda i: gcols[i])
            order_w = sorted(range(len(wcols)), key=lambda i: wcols[i])
            gs = sorted(tuple(canon(r[i]) for i in order_g) for r in grows)
            ws = sorted(tuple(canon(r[i]) for i in order_w) for r in wrows)
            for a, b in zip(gs, ws):
                if a != b:
                    print(f"  spark : {a}\n  duckdb: {b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} not-dumped ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
