#!/usr/bin/env python
"""Plan census: count duplicate base-table scans per query plan.

For every non-streaming/non-pipeline registered query, build the
DataFrame, take explain("formatted"), and count how many times each
big harness table's location appears — a shared subtree consumed by
multiple plan branches shows up as repeated scans (Catalyst does not
dedup branches whose exchanges carry partial aggregation).  The r15
pin sweep used this census to target localCheckpoint candidates;
writes tools/scan_census.json.
"""
import os
import sys, re, json, collections
sys.path.insert(0,'/root/repo')
from aws_pandas_etl_spark.session import get_spark
from aws_pandas_etl_spark.plans import queries as Q
spark = get_spark(app_name='census')
sf='/root/testdata/sf0.1'
try: Q.prebuild_shared_artifacts(spark, sf)
except Exception as e: print("prebuild fail", e, file=sys.stderr)
SKIP_PREFIX = ('streaming_','pipeline_')
out={}
for name in sorted(Q.QUERIES):
    if name.startswith(SKIP_PREFIX): continue
    try:
        df = Q.QUERIES[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    except Exception as e:
        out[name]={"err":str(e)[:100]}; continue
    # count scans per location basename
    locs = re.findall(r"Location:.*?\[([^\]]*)\]", plan)
    paths = [l.split('/')[-1].split('.')[0] or l for l in locs]
    big = [p for p in paths if any(t in p for t in ('events','documents','lineitem','embeddings','orders','part','customer','supplier'))]
    c = collections.Counter(big)
    dups = {t:n for t,n in c.items() if n>=2}
    if dups: out[name]=dups
json.dump(out, open(os.path.join(os.path.dirname(os.path.abspath(__file__)), 'scan_census.json'),'w'), indent=0)
print(len(out), "queries with >=2 scans of a big table")
for k,v in sorted(out.items()): print(k, v)
