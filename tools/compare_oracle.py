import duckdb, json, sys, glob, math

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_sf0001'

con = duckdb.connect()
for tbl in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return 'nan'
        return f'{v:.9g}'
    return str(v)

fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        print(f'{name}: NO SPARK OUTPUT'); fails += 1; continue
    # materialize via pandas, like the driver — DuckDB HUGEINT becomes
    # float64 here, reproducing the driver's hashing behavior exactly
    sp = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    spark_df = list(sp.itertuples(index=False, name=None))
    spark_cols = list(sp.columns)
    try:
        duck = con.sql(sql).df()
        duck_cols = list(duck.columns)
        duck_rows = list(duck.itertuples(index=False, name=None))
    except Exception as e:
        print(f'{name}: ORACLE SQL ERROR: {e}'); fails += 1; continue
    if sorted(spark_cols) != sorted(duck_cols):
        print(f'{name}: SCHEMA MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}'); fails += 1; continue
    # sort columns by name, rows by value
    sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
    didx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s = sorted(tuple(norm(r[i]) for i in sidx) for r in spark_df)
    d = sorted(tuple(norm(r[i]) for i in didx) for r in duck_rows)
    if s == d:
        print(f'{name}: OK ({len(s)} rows)')
    else:
        fails += 1
        print(f'{name}: MISMATCH spark={len(s)} duck={len(d)} rows')
        so, do = set(s), set(d)
        for x in list(so - do)[:3]: print('  spark-only:', x)
        for x in list(do - so)[:3]: print('  duck-only :', x)
print('FAILS:', fails)
