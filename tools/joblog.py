#!/usr/bin/env python3
"""Parse a Spark event log: print per-job wall, stage breakdown."""
import json, sys, glob, os
path = sys.argv[1] if len(sys.argv)>1 else max(glob.glob('/tmp/spark-events/*'), key=os.path.getmtime)
jobs={}; stages={}
for line in open(path):
    try: e=json.loads(line)
    except: continue
    t=e.get('Event')
    if t=='SparkListenerJobStart':
        jobs[e['Job ID']]={'t0':e['Submission Time'],'desc':e.get('Properties',{}).get('spark.job.description','')[:90],'stages':[s['Stage ID'] for s in e['Stage Infos']]}
    elif t=='SparkListenerJobEnd':
        jobs.setdefault(e['Job ID'],{}).update(t1=e['Completion Time'])
    elif t=='SparkListenerStageCompleted':
        si=e['Stage Info']
        stages[si['Stage ID']]={'name':si['Stage Name'][:70],'tasks':si['Number of Tasks'],
            'ms':si.get('Completion Time',0)-si.get('Submission Time',0)}
for jid in sorted(jobs):
    j=jobs[jid]
    if 't1' not in j or 't0' not in j: continue
    print(f"job {jid:3d} {(j['t1']-j['t0'])/1000:7.2f}s  {j.get('desc','')}")
    for sid in j.get('stages',[]):
        s=stages.get(sid)
        if s and s['ms']>80: print(f"    stage {sid:3d} {s['ms']/1000:6.2f}s tasks={s['tasks']:3d} {s['name']}")
