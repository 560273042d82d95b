import duckdb, json, glob, sys
import pandas as pd

d = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

for name in sorted(glob.glob(f'{out}/*/')):
    qname = name.rstrip('/').split('/')[-1]
    spark_df = pd.read_parquet(name)
    nrows = len(spark_df)
    if qname not in oracle:
        status = 'ROWS_ONLY ' + ('OK' if nrows > 0 else 'EMPTY!!')
        print(f'{qname:24s} rows={nrows:7d} {status}')
        continue
    duck_df = con.sql(oracle[qname]).df()
    s, k = canon(spark_df), canon(duck_df)
    schema_match = list(s.columns) == list(k.columns)
    if not schema_match:
        print(f'{qname:24s} SCHEMA MISMATCH spark={list(s.columns)} duck={list(k.columns)}')
        continue
    if len(s) != len(k):
        print(f'{qname:24s} ROWCOUNT MISMATCH spark={len(s)} duck={len(k)}')
        continue
    # value compare (stringified to mimic hashing)
    sa = s.astype(str); ka = k.astype(str)
    eq = sa.equals(ka)
    if eq:
        print(f'{qname:24s} rows={nrows:7d} HASH MATCH')
    else:
        diff = (sa != ka).any(axis=1)
        print(f'{qname:24s} VALUE MISMATCH in {diff.sum()} rows; first:')
        idx = diff[diff].index[:3]
        for i in idx:
            print('  spark:', dict(s.loc[i]))
            print('  duck :', dict(k.loc[i]))

# oracle entries whose Spark dump is MISSING (Verify swallowed the
# query's exception) must be loud, not silently skipped
dumped = {p.rstrip('/').split('/')[-1] for p in glob.glob(f'{out}/*/')}
for qname in sorted(set(oracle) - dumped):
    print(f'{qname:24s} MISSING SPARK DUMP (query failed in Verify?)')
