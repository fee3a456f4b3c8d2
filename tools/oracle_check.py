#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfdir> <verify_outdir> [--diff N] [--only PREFIX]
       oracle_check.py <sfdir> <verify_outdir> --audit-types

Loads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same parquet tables, then
compares: schema (column names sorted), row count, and a hash of all values
(columns sorted by name, rows sorted). Prints per-query PASS/FAIL.

--diff N        on a hash mismatch, print the first N row-level differences
                from BOTH engines (rows only on the Spark side, rows only on
                the DuckDB side) instead of just the first differing pair.
--only PREFIX   restrict the check to query names starting with PREFIX.
--audit-types   don't compare; instead print every oracle column whose DuckDB
                type degrades through pandas/arrow fetch paths (HUGEINT ->
                float64 renders 5000 as "5000.0" and hash-mismatches vs Spark
                even though tuple-based fetchall passes — the root cause of
                the r08/r09 mix1 driver-gate red).
"""
import json, sys, math, hashlib, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB logical types whose values do not survive a pandas/arrow round-trip
# as exact integers/strings (driver gates may fetch either way).
FRAGILE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


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


def canon_rows(cols, rows):
    """Sorted list of canonical row tuples, columns ordered by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def table_digest(cols, rows):
    h = hashlib.sha256()
    for row in canon_rows(cols, rows):
        h.update("\x1f".join(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def connect(sfdir):
    con = duckdb.connect()
    # Spark side is pinned UTC; pin DuckDB too or timestamp-emitting queries
    # (to_timestamp casts, TIMESTAMPTZ parquet reads) become host-TZ-dependent
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        # driver testdata ships single parquet FILES; GenScale-produced
        # scale dirs are Spark parquet DIRECTORIES — glob those
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def audit_types(sfdir, outdir):
    """Print oracle columns with pandas-fragile DuckDB types. Exit 1 if any."""
    con = connect(sfdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:
            print(f"AUDIT-ERR {name}: {e}")
            bad += 1
            continue
        for c, t in zip(rel.columns, rel.types):
            ts = str(t)
            if any(f in ts for f in FRAGILE_TYPES):
                print(f"FRAGILE {name}.{c}: {ts}")
                bad += 1
    print(f"== audit: {bad} fragile columns ==")
    return 1 if bad else 0


def main(sfdir, outdir, diff_n=0, only=None):
    con = connect(sfdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and not name.startswith(only):
            n_skip += 1
            continue
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
            gs, ws = canon_rows(gcols, grows), canon_rows(wcols, wrows)
            if diff_n > 0:
                # full set diff, first N from each side, with sorted col names
                names = "|".join(sorted(gcols))
                g_only = [r for r in gs if r not in set(ws)]
                w_only = [r for r in ws if r not in set(gs)]
                print(f"  cols ({names}); spark-only {len(g_only)} rows, "
                      f"duckdb-only {len(w_only)} rows")
                for r in g_only[:diff_n]:
                    print(f"  spark : {r}")
                for r in w_only[:diff_n]:
                    print(f"  duckdb: {r}")
            else:
                # show first differing row for debugging
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
    argv = sys.argv[1:]
    if "--audit-types" in argv:
        argv.remove("--audit-types")
        sys.exit(audit_types(argv[0], argv[1]))
    diff_n = 0
    only = None
    if "--diff" in argv:
        i = argv.index("--diff")
        diff_n = int(argv[i + 1])
        del argv[i:i + 2]
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1]
        del argv[i:i + 2]
    sys.exit(main(argv[0], argv[1], diff_n, only))
