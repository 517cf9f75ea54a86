"""Graph container tests (ref include/instance/graph.cuh semantics)."""
import numpy as np
import pytest

from graphvite_tpu.graph import Graph, KnowledgeGraph


def toy_graph(**kwargs):
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    return Graph().load_edge_list(edges, **kwargs)


def test_name_maps_first_seen_order():
    g = toy_graph()
    assert g.id2name == ["a", "b", "c", "d"]
    assert g.name2id == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_undirected_symmetrization():
    g = toy_graph(as_undirected=True)
    assert g.num_edge == 4
    assert g.num_directed_edge == 8
    nbrs, _ = g.neighbors(1)  # b: a->b reverse + b->c
    assert set(nbrs.tolist()) == {0, 2}


def test_directed():
    g = toy_graph(as_undirected=False)
    assert g.num_directed_edge == 4
    nbrs, _ = g.neighbors(1)
    assert set(nbrs.tolist()) == {2}


def test_self_loop_not_duplicated():
    g = Graph().load_edge_list([("a", "a"), ("a", "b")], as_undirected=True)
    assert g.num_directed_edge == 3  # self loop not mirrored (graph.cuh:149)


def test_normalization():
    # w'_{uv} = w / sqrt(out_w[u] * in_w[v])  (graph.cuh:103-121)
    g = Graph().load_edge_list([("a", "b"), ("a", "c"), ("b", "c")],
                               as_undirected=False, normalization=True)
    out_w = np.array([2.0, 1.0, 0.0])
    in_w = np.array([0.0, 1.0, 2.0])
    for u, v, w in zip(g.edge_heads, g.edge_tails, g.edge_weights):
        np.testing.assert_allclose(w, 1.0 / np.sqrt(out_w[u] * in_w[v]),
                                   rtol=1e-6)


def test_weighted_edges():
    g = Graph().load_edge_list([("a", "b", 2.0), ("b", "c", 3.0)],
                               as_undirected=False)
    np.testing.assert_allclose(sorted(g.edge_weights.tolist()), [2.0, 3.0])


def test_load_file(tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("# comment line\na b\nb c 2.5\n\n")
    g = Graph().load_file(str(p), as_undirected=False)
    assert g.num_edge == 2
    assert g.edge_weights.tolist() == [1.0, 2.5]


def test_kg_build():
    kg = KnowledgeGraph().load_triplet_list([
        ("e1", "r1", "e2"), ("e2", "r2", "e3"), ("e1", "r2", "e3")])
    assert kg.num_vertex == 3
    assert kg.num_relation == 2
    assert kg.num_edge == 3
    assert kg.id2entity == ["e1", "e2", "e3"]
    assert kg.id2relation == ["r1", "r2"]


def test_kg_normalization():
    kg = KnowledgeGraph().load_triplet_list(
        [("a", "r", "b"), ("a", "r", "c"), ("d", "r", "b")],
        normalization=True)
    # head_weight[(a,r)] = 2, tail_weight[(b,r)] = 2 etc.
    w = {}
    for h, t, r, ww in zip(kg.edge_heads, kg.edge_tails, kg.edge_relations,
                           kg.edge_weights):
        w[(kg.id2entity[h], kg.id2entity[t])] = ww
    np.testing.assert_allclose(w[("a", "b")], 1 / np.sqrt(2 * 2), rtol=1e-6)
    np.testing.assert_allclose(w[("a", "c")], 1 / np.sqrt(2 * 1), rtol=1e-6)
    np.testing.assert_allclose(w[("d", "b")], 1 / np.sqrt(1 * 2), rtol=1e-6)


def test_save_roundtrip(tmp_path):
    g = toy_graph(as_undirected=False)
    p = tmp_path / "out.txt"
    g.save(str(p))
    g2 = Graph().load_file(str(p), as_undirected=False)
    assert g2.num_edge == g.num_edge
    assert set(g2.id2name) == set(g.id2name)


def test_word_graph_fast_path_matches_fallback(tmp_path):
    """The numpy fast path (default whitespace tokens) must build the same
    graph as the per-line fallback (forced via explicit delimiters):
    same vocabulary ids (first-seen order), same edges and weights."""
    import numpy as np
    from graphvite_tpu.word_graph import WordGraph
    rng = np.random.default_rng(7)
    words = ["w%d" % i for i in range(50)]
    corpus = tmp_path / "corpus.txt"
    with open(corpus, "w") as f:
        for _ in range(300):
            n = rng.integers(3, 12)
            f.write(" ".join(rng.choice(words, n)) + "\n")
        f.write("w1 w2 w3 # a trailing comment w4 w5\n")

    fast = WordGraph().load_file(str(corpus), window=3, min_count=2)
    slow = WordGraph().load_file(str(corpus), window=3, min_count=2,
                                 delimiters=" \t\n")
    assert fast.id2name == slow.id2name
    assert fast.num_edge == slow.num_edge
    ef = sorted(zip(fast.edge_heads.tolist(), fast.edge_tails.tolist(),
                    fast.edge_weights.tolist()))
    es = sorted(zip(slow.edge_heads.tolist(), slow.edge_tails.tolist(),
                    slow.edge_weights.tolist()))
    assert ef == es
