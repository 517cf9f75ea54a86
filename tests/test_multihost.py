"""Multi-host (multi-process) communication backend test.

The episode engines are plain shard_map + ppermute/psum, so they run
unchanged over a mesh spanning processes once `jax.distributed` is up
(parallel/mesh.py make_mesh reads GRAPHVITE_COORDINATOR /
GRAPHVITE_NUM_PROCESSES / GRAPHVITE_PROCESS_ID). This test spawns TWO
local processes with 2 virtual CPU devices each (a 4-device global mesh
over the gloo CPU collectives backend) and drives the sharded graph
episode engine end to end — the ring rotation and the all-device RNG path
cross a real process boundary, the closest this single-host environment
gets to SURVEY §5's DCN story.
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["GRAPHVITE_COORDINATOR"] = "localhost:" + port
    os.environ["GRAPHVITE_NUM_PROCESSES"] = "2"
    os.environ["GRAPHVITE_PROCESS_ID"] = str(pid)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from graphvite_tpu.graph import Graph
    from graphvite_tpu.models import GRAPH_MODELS
    from graphvite_tpu.optim import Optimizer
    from graphvite_tpu.parallel.mesh import (VertexPartition,
                                             ShardedGraphTrainer, make_mesh)

    rng = np.random.default_rng(0)
    V = 256
    edges = [(str(rng.integers(V)), str(rng.integers(V)))
             for _ in range(2048)]
    g = Graph().load_edge_list(edges)
    mesh = make_mesh()
    assert jax.device_count() == 4 and jax.local_device_count() == 2
    P_ = mesh.devices.size
    part = VertexPartition(np.asarray(g.degrees), P_)
    opt = Optimizer(type="SGD", lr=0.025, weight_decay=5e-3)
    tr = ShardedGraphTrainer(mesh, part, 16, GRAPH_MODELS["LINE"], opt,
                             num_negative=2, negative_weight=1.0,
                             batch_size=64, ep_batches=2)
    vertex = rng.uniform(-0.03, 0.03, (g.num_vertex, 16)).astype(np.float32)
    context = np.zeros((g.num_vertex, 16), np.float32)
    state = tr.init_state(vertex, context)
    neg = tr.init_negative_state(g.vertex_weights)
    blocks = tr.build_sample_state(g)
    from jax.experimental import multihost_utils
    for e in range(4):
        state, neg, losses = tr.run_episode(state, blocks, neg, e * 2 * P_,
                                            64, seed=e)
    l = multihost_utils.process_allgather(losses, tiled=True)
    v = multihost_utils.process_allgather(state["tables"][0], tiled=True)
    assert np.isfinite(np.asarray(l)).all()
    assert np.isfinite(np.asarray(v)).all()
    print("MH_OK pid=%d devices=%d loss=%.6f" % (
        pid, jax.device_count(), float(np.asarray(l).mean())), flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_episode_engine(tmp_path):
    worker = tmp_path / "mh_worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("XLA_", "JAX_"))}
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "worker %d failed:\n%s" % (i, out[-3000:])
        assert "MH_OK pid=%d devices=4" % i in out, out[-2000:]
    # both processes computed the same global loss
    l0 = [x for x in outs[0].splitlines() if x.startswith("MH_OK")][0]
    l1 = [x for x in outs[1].splitlines() if x.startswith("MH_OK")][0]
    assert l0.split("loss=")[1] == l1.split("loss=")[1]
