#!/usr/bin/env python3
"""Round-11 10x-scale oracle pass (verdict ask #6): run every oracle
SQL in DuckDB against the GenScale-synthesized /tmp/sfdata/sf1 tables
and compare with the Spark dump from `graft.Verify /tmp/sfdata/sf1`.

Priority order puts the cardinality-sensitive families first (cap
diverts, histogram bucket edges, LSH bucket sizing, sketches) so a
wall-clock-bounded run still covers the queries the 10x pass exists
to check. Writes CORRECTNESS_sf1_local.json with per-query rows.

Usage: python3 tools/sf1_compare.py [dump_dir] [data_dir] [budget_s]
"""
import duckdb, json, glob, sys, time, os
import pyarrow.parquet as pq
import pandas as pd

dump = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_sf1'
data = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sfdata/sf1'
budget = float(sys.argv[3]) if len(sys.argv) > 3 else 3600.0

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    p = f'{data}/{t}.parquet'
    # GenScale writes Spark-style parquet DIRECTORIES for the grown
    # tables; the small pass-through tables stay single files
    if os.path.isdir(p):
        p = f'{p}/*.parquet'
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

# restrict to queries actually dumped — Verify writes the FULL oracle
# map even for a subset dump, and comparing undumped queries would
# just manufacture errors
sqls = {k: v for k, v in
        json.load(open(f'{dump}/oracle_sql.json')).items()
        if glob.glob(f'{dump}/{k}/*.parquet')}

PRIORITY = ['_capped', 'divert', 'semantic', 'budget', 'quota',
            'sketch_', 'dedup_', 'sample_', 'hist', 'lsh', 'hamming',
            'embed_', 'stats_']
def prio(name):
    for i, p in enumerate(PRIORITY):
        if p in name:
            return (i, name)
    return (len(PRIORITY), name)

results, bad, done = {}, 0, 0
t_start = time.time()
for name in sorted(sqls, key=prio):
    if time.time() - t_start > budget:
        results[name] = {'skipped': 'budget'}
        continue
    t0 = time.time()
    try:
        files = glob.glob(f'{dump}/{name}/*.parquet')
        got = pd.concat([pq.read_table(f).to_pandas() for f in files])
        exp = con.execute(sqls[name]).fetchdf()
        # widen integer/float widths before comparing — the driver's
        # real gate canonicalizes VALUES, so an int32-vs-int64 dtype
        # difference (DuckDB keeps the source width, Spark casts)
        # must not read as a mismatch
        def canon(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:
                k = df[c].dtype.kind
                if k in 'iu':
                    df[c] = df[c].astype('int64')
                elif k == 'f':
                    df[c] = df[c].astype('float64')
            return df.sort_values(by=list(df.columns)) \
                     .reset_index(drop=True)
        g, e = canon(got), canon(exp)
        ok = bool(g.equals(e))
        results[name] = {'rows': len(g), 'match': ok,
                         'oracle_sec': round(time.time() - t0, 2)}
        done += 1
        if not ok:
            bad += 1
            print('FAIL', name, flush=True)
    except Exception as ex:
        results[name] = {'err': str(ex)[:300]}
        bad += 1
        print('ERR', name, str(ex)[:120], flush=True)

# MERGE into the existing artifact (same lesson as the round-11
# BENCH_BEST sf-keying fix: a subset run must never discard rows a
# previous run accumulated)
try:
    out = json.load(open('CORRECTNESS_sf1_local.json'))
except Exception:
    out = {'scale': 'sf1 (10x sf0.1, GenScale)', 'data': data,
           'queries': {}}
# a budget-skip must not clobber a real comparison row a previous
# run accumulated — only write 'skipped' when the key is absent
for k, v in results.items():
    if 'skipped' in v and k in out['queries'] \
            and 'skipped' not in out['queries'][k]:
        continue
    out['queries'][k] = v
out['queries'] = dict(sorted(out['queries'].items()))
out['compared'] = sum(1 for r in out['queries'].values() if 'rows' in r)
out['failed'] = sum(1 for r in out['queries'].values()
                    if 'rows' in r and not r['match'])
out['skipped'] = sum(1 for r in out['queries'].values() if 'skipped' in r)
json.dump(out, open('CORRECTNESS_sf1_local.json', 'w'), indent=1)
print(f'{done - bad}/{done} matched '
      f'({out["skipped"]} budget-skipped)', flush=True)
