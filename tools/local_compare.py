#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Runs each oracle SQL from a Verify dump in its OWN subprocess (a DuckDB
segfault or hang on one query must not zero the whole round), compares
against the Spark parquet result: row count, column names (sorted), and
values (rows sorted, floats rounded to 9 significant digits).
"""
import json, os, subprocess, sys, concurrent.futures as cf

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

WORKER = r'''
import duckdb, json, sys, math
sf, out, name, sql = sys.argv[1:5]
con = duckdb.connect()
for t in %s:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v): return "nan"
            if v == 0: return "0"
            return "%%.9g" %% v
        if isinstance(v, bool): return str(int(v))
        return str(v)
    return sorted(tuple(norm(r[i]) for i in order) for r in rows), [cols[i] for i in order]
try:
    o = con.execute(sql)
    ocols = [d[0] for d in o.description]; orows = o.fetchall()
except Exception as e:
    print(json.dumps({"err": "oracle: " + str(e)[:300]})); sys.exit(0)
try:
    s = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
    scols = [d[0] for d in s.description]; srows = s.fetchall()
except Exception as e:
    print(json.dumps({"err": "spark-read: " + str(e)[:300]})); sys.exit(0)
oc, ocn = canon(orows, ocols); sc, scn = canon(srows, scols)
res = {"rows_match": len(orows) == len(srows), "schema_match": ocn == scn,
       "hash_match": oc == sc, "spark_rows": len(srows), "oracle_rows": len(orows), "err": None}
if not res["hash_match"] and res["rows_match"] and res["schema_match"]:
    diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:2]
    res["first_diff"] = repr(diffs)[:400]
print(json.dumps(res))
''' % repr(TABLES)

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
names = sorted(n for n in oracle if os.path.isdir(f"{OUT}/{n}") and (ONLY is None or n in ONLY))

def run(name):
    try:
        p = subprocess.run([sys.executable, "-c", WORKER, SF, OUT, name, oracle[name]],
                           capture_output=True, text=True, timeout=120)
        if p.returncode != 0:
            return name, {"err": f"CRASH rc={p.returncode}: {p.stderr[-300:]}"}
        return name, json.loads(p.stdout.strip().splitlines()[-1])
    except subprocess.TimeoutExpired:
        return name, {"err": "TIMEOUT 120s"}
    except Exception as e:
        return name, {"err": "harness: " + str(e)[:200]}

results = {}
with cf.ThreadPoolExecutor(8) as ex:
    for name, res in ex.map(run, names):
        results[name] = res
        ok = res.get("hash_match") and res.get("rows_match") and res.get("schema_match")
        if not ok:
            print(f"FAIL {name}: {json.dumps(res)[:500]}")
good = sum(1 for r in results.values()
           if r.get("hash_match") and r.get("rows_match") and r.get("schema_match"))
print(f"\n{good}/{len(results)} green")
json.dump(results, open("/tmp/local_correctness.json", "w"), indent=1)
