#!/usr/bin/env python3
"""Local replica of the driver's correctness compare.

Usage: python3 tools/vcheck.py <sfDir> <verifyOutDir> [query1,query2,...]

Reads <verifyOutDir>/<name>/ parquet (Spark result) and runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
tables; compares row count, sorted-by-name schema, and cell values after
sorting columns by name and rows by value — the driver's hash discipline.
"""
import duckdb, json, sys, glob, math

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
sql = json.load(open(f'{out}/oracle_sql.json'))
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
# Derived corpora (graft.ScaleUp) normalize events.ts to epoch-ns BIGINT —
# one of Tsdb's three documented ts variants; the oracle SQL assumes a
# timestamp, so expose that variant as TIMESTAMP at the view layer.
if con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0] == 'BIGINT':
    con.execute("CREATE OR REPLACE VIEW events AS "
                f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                f"FROM read_parquet('{sf}/events.parquet')")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return 'NaN'
        return round(v, 6)
    return v


def normtype(t):
    """Canonicalize an arrow type so only driver-visible differences remain.

    The driver hashes pyarrow-fetched values, so a DuckDB HUGEINT (arrow
    decimal128(38,0)) hashes differently from a Spark BIGINT (int64) even
    when the values are equal — the r16 table_schema_evolution red. Integer
    widths, timestamp units, and string flavors all canonicalize to the
    same value on fetch, so collapse those; keep decimal distinct from int
    and float so the HUGEINT class is caught locally.
    """
    s = str(t)
    if s.startswith(('int', 'uint')):
        return 'int'
    if s.startswith('timestamp'):
        return 'timestamp'
    if s in ('string', 'large_string', 'string_view'):
        return 'string'
    if s in ('float', 'halffloat'):
        return 'double'
    if s.startswith('large_list'):
        return 'list' + s[10:]
    if s.startswith('list'):
        return 'list' + s[4:]
    return s


fails = []
for name, q in sorted(sql.items()):
    if only and name not in only:
        continue
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        print(f'{name}: NO SPARK OUTPUT')
        fails.append(name)
        continue
    try:
        oc = con.execute(q)
        ocols = [d[0] for d in oc.description]
        orows = oc.fetchall()
    except Exception as e:
        print(f'{name}: ORACLE ERR {e}')
        fails.append(name)
        continue
    sc = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
    scols = [d[0] for d in sc.description]
    srows = sc.fetchall()
    if sorted(ocols) != sorted(scols):
        print(f'{name}: SCHEMA {sorted(scols)} vs {sorted(ocols)}')
        fails.append(name)
        continue
    # Declared-type check (LIMIT-0 arrow schemas): catches the
    # HUGEINT-vs-BIGINT class the value compare normalizes away.
    try:
        osch = con.execute(f'SELECT * FROM ({q}) LIMIT 0').arrow().schema
        ssch = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet') LIMIT 0"
        ).arrow().schema
        otypes = {f.name: normtype(f.type) for f in osch}
        stypes = {f.name: normtype(f.type) for f in ssch}
        tdiff = {c: (stypes[c], otypes[c]) for c in otypes
                 if stypes.get(c) != otypes[c]}
        if tdiff:
            print(f'{name}: TYPES spark-vs-oracle {tdiff}')
            fails.append(name)
            continue
    except Exception as e:
        print(f'{name}: (type check skipped: {e})')
    if len(orows) != len(srows):
        print(f'{name}: ROWS spark={len(srows)} oracle={len(orows)}')
        fails.append(name)
        continue
    op = [i for _, i in sorted((c, i) for i, c in enumerate(ocols))]
    sp = [i for _, i in sorted((c, i) for i, c in enumerate(scols))]
    o = sorted(tuple(norm(r[i]) for i in op) for r in orows)
    s = sorted(tuple(norm(r[i]) for i in sp) for r in srows)
    if o != s:
        bad = next(i for i in range(len(o)) if o[i] != s[i])
        print(f'{name}: VALUES diverge at sorted row {bad}:')
        print(f'  spark : {s[bad]}')
        print(f'  oracle: {o[bad]}')
        fails.append(name)
        continue
    print(f'{name}: OK ({len(srows)} rows)')

print('---')
print('FAILED:', fails if fails else 'none')
sys.exit(1 if fails else 0)
