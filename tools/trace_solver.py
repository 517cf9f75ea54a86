"""Capture + summarize a device trace of the real solver episodes.

The TPU-era analog of the reference's USE_TIMER stage breakdown
(util/time.h:28-60): run the bench workload (LINE node embedding or the
RotatE KG pillar) at steady state, record one epoch under jax.profiler,
and aggregate per-op device time from the trace so PERF.md's "where the
time goes" tables are reproducible.

Usage:
    python tools/trace_solver.py line [trace_dir]
    python tools/trace_solver.py kg   [trace_dir]
    python tools/trace_solver.py parse <trace.json.gz>
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse(path, top=25):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pid_name = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "device" in n.lower()}
    agg, cnt, total = collections.Counter(), collections.Counter(), 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            dur = e.get("dur", 0) / 1e3  # us -> ms
            base = e["name"].split(".")[0]   # collapse fusion suffixes
            agg[base] += dur
            cnt[base] += 1
            total += dur
    print("total device ms: %.1f" % total)
    for name, ms in agg.most_common(top):
        print("%9.2f ms  x%-6d %s" % (ms, cnt[name], name[:100]))


def run(which, trace_dir):
    import jax
    import bench

    if which == "kg":
        from graphvite_tpu.solver import KnowledgeGraphSolver
        g = bench.synthetic_kg()
        solver = KnowledgeGraphSolver(dim=2048)
        solver.build(g, optimizer={"type": "Adam", "lr": 2.0e-4,
                                   "weight_decay": 0},
                     num_negative=64, batch_size=100000, episode_size=50)
        kw = dict(model="RotatE", margin=24, adversarial_temperature=2,
                  log_frequency=10**9)
        epochs = 1
    elif which == "deepwalk":
        from graphvite_tpu.solver import GraphSolver
        g = bench.synthetic_graph()
        solver = GraphSolver(dim=128, float_type="bfloat16")
        solver.build(g, num_negative=1, batch_size=200000, episode_size=50)
        kw = dict(model="DeepWalk",
                  augmentation_step=int(os.environ.get("TRACE_AUG", 5)),
                  random_walk_length=40, log_frequency=10**9)
        epochs = 3
    else:
        from graphvite_tpu.solver import GraphSolver
        g = bench.synthetic_graph()
        solver = GraphSolver(dim=128, float_type="bfloat16")
        solver.build(g, num_negative=1, batch_size=200000, episode_size=50)
        kw = dict(model="LINE", augmentation_step=1, log_frequency=10**9)
        epochs = 3
    solver.train(num_epoch=epochs, **kw)        # compile
    t0 = time.time()
    solver.train(num_epoch=epochs, **kw)        # steady-state rate
    dt = time.time() - t0
    n = solver.num_batch * solver.effective_batch
    print("steady: %.2fs -> %.4g samples/s (B=%d)"
          % (dt, n / dt, solver.effective_batch), flush=True)
    jax.profiler.start_trace(trace_dir)
    solver.train(num_epoch=1, **kw)
    jax.profiler.stop_trace()
    for p in glob.glob(os.path.join(
            trace_dir, "plugins/profile/*/*.trace.json.gz")):
        print(p, flush=True)
        parse(p)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "line"
    if which == "parse":
        parse(sys.argv[2])
    else:
        run(which, sys.argv[2] if len(sys.argv) > 2 else
            "/tmp/%s_trace" % which)
