"""Sampler statistics: alias distributions, walk augmentation, pseudo-shuffle."""
import numpy as np

from graphvite_tpu.graph import Graph
from graphvite_tpu.ops.alias import AliasTable, PackedAliasTables, device_alias_arrays
from graphvite_tpu.sampler import (EdgeSampler, RandomWalkSampler,
                                   pseudo_shuffle)


def test_alias_distribution():
    w = np.array([1.0, 2.0, 3.0, 4.0])
    t = AliasTable(w)
    rng = np.random.default_rng(0)
    s = t.sample(rng, 200000)
    freq = np.bincount(s, minlength=4) / s.size
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.01)


def test_alias_sums_to_probability():
    w = np.random.default_rng(1).random(100) + 0.01
    t = AliasTable(w)
    # total mass per column: prob[i]/n + sum_{alias[j]==i}(1-prob[j])/n
    mass = t.prob / t.count
    np.add.at(mass, t.alias, (1 - t.prob) / t.count)
    np.testing.assert_allclose(mass, w / w.sum(), atol=1e-12)


def test_packed_alias():
    offsets = np.array([0, 2, 5])
    w = np.array([1.0, 3.0, 1.0, 1.0, 2.0])
    t = PackedAliasTables(w, offsets)
    rng = np.random.default_rng(0)
    n = 100000
    ids = np.zeros(n, dtype=np.int64)
    s = t.sample(ids, rng.random(n), rng.random(n))
    freq = np.bincount(s, minlength=2) / n
    np.testing.assert_allclose(freq, [0.25, 0.75], atol=0.01)


def test_device_sample_matches_host():
    import jax.numpy as jnp
    from graphvite_tpu.ops.alias import device_sample
    w = np.array([5.0, 1.0, 1.0, 1.0])
    t = AliasTable(w)
    # packed form (small tables pack prob+alias into one [n, 2] f32 row)
    arrays = device_alias_arrays(t)
    assert len(arrays) == 1 and arrays[0].shape == (4, 2)
    rng = np.random.default_rng(0)
    u1, u2 = rng.random(100000), rng.random(100000)
    dev = np.asarray(device_sample(*(jnp.asarray(a) for a in arrays),
                                   jnp.asarray(u1), jnp.asarray(u2)))
    freq = np.bincount(dev, minlength=4) / dev.size
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.01)
    # unpacked form must agree exactly
    dev2 = np.asarray(device_sample(jnp.asarray(t.prob, jnp.float32),
                                    jnp.asarray(t.alias, jnp.int32),
                                    jnp.asarray(u1), jnp.asarray(u2)))
    np.testing.assert_array_equal(dev, dev2)


def test_pseudo_shuffle():
    a = np.arange(12)
    (out,) = pseudo_shuffle([a], 3)
    # out[o % 3 * 4 + o // 3] = a[o]
    expect = np.empty(12, dtype=int)
    for o in range(12):
        expect[o % 3 * 4 + o // 3] = a[o]
    np.testing.assert_array_equal(out, expect)


def ring_graph(n=20):
    edges = [(str(i), str((i + 1) % n)) for i in range(n)]
    return Graph().load_edge_list(edges, as_undirected=True)


def test_edge_sampler_pool():
    g = ring_graph()
    s = EdgeSampler(g, seed=0)
    heads, tails = s.pool(1000)
    assert heads.shape == (1000,)
    # every (h, t) must be a real directed edge
    keys = set(zip(g.edge_heads.tolist(), g.edge_tails.tolist()))
    assert all((h, t) in keys for h, t in zip(heads.tolist(), tails.tolist()))


def test_random_walk_pairs_within_augmentation():
    g = ring_graph(30)
    s = RandomWalkSampler(g, augmentation_step=3, random_walk_length=10, seed=1)
    heads, tails = s.pool(2000)
    # on a ring, nodes within k hops differ by <= k (mod n)
    d = np.abs(heads.astype(int) - tails.astype(int))
    d = np.minimum(d, 30 - d)
    assert d.max() <= 3
    assert d.min() >= 1  # pairs are (j, j+k) with k >= 1


def test_walk_dead_end_truncates():
    # path graph a->b->c directed: walks can't continue past c
    g = Graph().load_edge_list([("a", "b"), ("b", "c")], as_undirected=False)
    s = RandomWalkSampler(g, augmentation_step=2, random_walk_length=5, seed=0)
    heads, tails = s.pool(100)
    keys = {(0, 1), (1, 2), (0, 2)}
    assert all((h, t) in keys for h, t in zip(heads.tolist(), tails.tolist()))


def test_node2vec_bias_extremes():
    # star + ring so second-order stats differ; just verify it runs and
    # produces valid pairs
    g = ring_graph(12)
    s = RandomWalkSampler(g, augmentation_step=2, random_walk_length=8,
                          seed=0, biased=True, p=0.25, q=4.0)
    heads, tails = s.pool(500)
    d = np.abs(heads.astype(int) - tails.astype(int))
    d = np.minimum(d, 12 - d)
    assert d.max() <= 2
