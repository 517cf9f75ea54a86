"""Dataset registry tests (offline-capable parts only)."""
import os

import numpy as np
import pytest

from graphvite_tpu import dataset as ds


def test_math_generation_deterministic():
    train = ds.math.train
    assert os.path.isfile(train)
    lines = open(train).read().splitlines()
    assert len(lines) == 20000
    # arithmetic consistency: x op c == y
    ops = {"+": lambda x, c: (x + c) % 1000, "-": lambda x, c: (x - c) % 1000,
           "*": lambda x, c: (x * c) % 1000, "/": lambda x, c: x // c,
           "%": lambda x, c: x % c}
    for line in lines[:200]:
        h, r, t = line.split("\t")
        op, c = r[0], int(r[1:])
        assert ops[op](int(h), c) == int(t)
    valid = ds.math.valid
    test = ds.math.test
    assert len(open(valid).read().splitlines()) == 1000
    assert len(open(test).read().splitlines()) == 1000


def test_registry_names():
    for name in ("blogcatalog", "youtube", "flickr", "friendster",
                 "wikipedia", "math", "fb15k", "fb15k-237", "wn18",
                 "wn18rr", "wikidata5m", "freebase", "mnist", "cifar10",
                 "imagenet", "hyperlink2012"):
        assert name in ds.DATASETS


def test_link_prediction_split(tmp_path):
    rng = np.random.default_rng(0)
    graph_file = tmp_path / "g.txt"
    with open(graph_file, "w") as f:
        for _ in range(600):
            f.write("%d\t%d\n" % (rng.integers(50), rng.integers(50)))
    files = [str(tmp_path / x) for x in ("tr.txt", "va.txt", "te.txt")]
    ds.link_prediction_split(str(graph_file), files, portions=[10, 1, 1])
    tr = open(files[0]).read().splitlines()
    va = open(files[1]).read().splitlines()
    assert all(len(l.split()) == 2 for l in tr)      # train: no labels
    labels = [l.split()[2] for l in va]
    assert set(labels) == {"0", "1"}                  # valid: labeled
    assert labels.count("0") == labels.count("1")     # balanced negatives


def test_top_k_label(tmp_path):
    src = tmp_path / "labels.txt"
    with open(src, "w") as f:
        for i in range(30):
            f.write("n%d\tbig\n" % i)
        for i in range(5):
            f.write("n%d\tsmall\n" % i)
        f.write("n0\ttiny\n")
    out = tmp_path / "topk.txt"
    ds.top_k_label(str(src), str(out), k=2)
    kept = {l.split()[1] for l in open(out).read().splitlines()}
    assert kept == {"big", "small"}
