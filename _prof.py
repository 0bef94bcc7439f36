"""Device-time profiling helper: runs fn N times under jax.profiler.trace
and returns total TPU-pid op time / N."""
import gzip, json, glob, os, shutil, collections

def device_ms(fn, *args, n=10, trace_dir='/tmp/jaxprof'):
    import jax
    o = fn(*args); jax.block_until_ready(o)
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(n):
            o = fn(*args)
        jax.block_until_ready(o)
    path = sorted(glob.glob(trace_dir + '/plugins/profile/*/*.trace.json.gz'))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    pids = {p.get('pid') for p in tr['traceEvents']
            if p.get('name')=='process_name' and 'TPU' in str(p.get('args',{}).get('name'))}
    # top-level device events only (avoid double count): keep events whose name starts with jit_
    tot = 0
    other = collections.Counter()
    for e in tr['traceEvents']:
        if e.get('ph')=='X' and e.get('pid') in pids:
            if e['name'].startswith('jit_'):
                tot += e['dur']
            else:
                other[e['name']] += e['dur']
    return tot/1e3/n, {k: v/1e3/n for k,v in other.most_common(8)}
