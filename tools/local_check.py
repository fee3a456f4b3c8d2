#!/usr/bin/env python3
"""Local correctness gate: compare Verify parquet dumps against the DuckDB
oracle (value-sorted rows + column types), mimicking the driver's check.
Usage: local_check.py <verify_out_dir> [sf_dir]"""
import duckdb, json, glob, sys, os
out = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
con.execute("SET threads=16")
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
osql = json.load(open(f'{out}/oracle_sql.json'))
names = sorted(d for d in os.listdir(out) if os.path.isdir(f'{out}/{d}'))
fail = 0
for name in names:
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files: print(f'{name}: NO PARQUET'); fail += 1; continue
    if name not in osql:
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        print(f'{name}: rows-only ({n} rows)'); continue
    try:
        cur = con.execute(osql[name]); ocols=[d[0] for d in cur.description]; orc = cur.fetchall()
        otyp = [r[1] for r in con.execute('DESCRIBE '+osql[name]).fetchall()]
    except Exception as e:
        print(f'{name}: ORACLE FAIL {str(e)[:120]}'); fail += 1; continue
    cur = con.execute(f"SELECT * FROM read_parquet({files!r})"); scols=[d[0] for d in cur.description]; sp = cur.fetchall()
    styp = [r[1] for r in con.execute(f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()]
    # driver sorts columns by name before hashing
    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        key = lambda t: tuple((v is None, str(type(v)), v if v is not None else 0) for v in t)
        return sorted((tuple(r[i] for i in order) for r in rows), key=key)
    ok_cols = sorted(scols) == sorted(ocols)
    ok_vals = ok_cols and norm(sp, scols) == norm(orc, ocols)
    ok_typ = sorted(zip(scols, styp)) == sorted(zip(ocols, otyp))
    tag = 'OK' if (ok_vals and ok_typ) else 'MISMATCH'
    if tag != 'OK':
        fail += 1
        print(f'{name}: {tag} cols={ok_cols} vals={ok_vals} types={ok_typ}')
        if not ok_typ: print('   spark', sorted(zip(scols,styp)), '\n   oracle', sorted(zip(ocols,otyp)))
        if ok_cols and not ok_vals:
            a, b = norm(sp, scols), norm(orc, ocols)
            diffs = [(x,y) for x,y in zip(a,b) if x!=y][:3]
            print('   first diffs', diffs, 'rows', len(a), len(b))
    else:
        print(f'{name}: OK ({len(sp)} rows)')
print('FAILED' if fail else 'ALL GREEN', fail)
sys.exit(1 if fail else 0)
