import duckdb, json, glob, sys, math
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv)>1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv)>2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
ok, bad = [], []
for name in sorted(oracle):
    try:
        files = glob.glob(f'{out}/{name}/*.parquet')
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files]) if files else None
        if spark_df is None: bad.append((name,'no spark output')); continue
        duck_df = con.execute(oracle[name]).fetchdf()
        # normalize: sort columns by name, sort rows by all columns
        def norm(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:
                if df[c].dtype == object: df[c] = df[c].astype(str)
            return df.sort_values(by=list(df.columns)).reset_index(drop=True)
        s, d = norm(spark_df), norm(duck_df)
        dt_mismatch = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                       if c in d.columns and str(s[c].dtype) != str(d[c].dtype)]
        if dt_mismatch:
            bad.append((name, f'dtypes {dt_mismatch}')); continue
        if list(s.columns) != list(d.columns):
            bad.append((name, f'cols spark={list(s.columns)} duck={list(d.columns)}')); continue
        if len(s) != len(d):
            bad.append((name, f'rows spark={len(s)} duck={len(d)}')); continue
        mismatch = None
        for c in s.columns:
            sv, dv = s[c].values, d[c].values
            if s[c].dtype.kind == 'f':
                eq = all((math.isnan(a) and math.isnan(b)) or a==b for a,b in zip(sv,dv))
            elif s[c].dtype.kind == 'M':
                # datetime: NaT != NaT under ==; null==null must pass
                eq = ((sv == dv) | (pd.isna(sv) & pd.isna(dv))).all()
            else:
                eq = (sv == dv).all()
            if not eq:
                diffs = [(i, sv[i], dv[i]) for i in range(len(sv)) if str(sv[i])!=str(dv[i])][:3]
                mismatch = f'col {c}: {diffs}'
                break
        if mismatch: bad.append((name, mismatch))
        else: ok.append((name, len(s)))
    except Exception as e:
        bad.append((name, f'EXC {type(e).__name__}: {e}'))
print('OK:', len(ok))
for n,r in ok: print('  PASS', n, f'({r} rows)')
print('BAD:', len(bad))
for n,m in bad: print('  FAIL', n, str(m)[:300])
