"""CLI / config-system tests (ref cmd.py behaviors)."""
import os

import numpy as np
import pytest

from graphvite_tpu import cmd
from graphvite_tpu.optim import Optimizer
from graphvite_tpu.utils.common import auto


def test_find_baselines_unique_and_ambiguous():
    configs = cmd.find_baselines(["quick", "start"])
    assert len(configs) == 1 and configs[0].endswith("quick_start.yaml")
    many = cmd.find_baselines(["rotate"])
    assert len(many) > 3


def test_load_config_substitutions(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("""
application: knowledge graph
resource:
  dim: 32
graph:
  file_name: <math.train>
build:
  optimizer:
    type: Adam
    lr: 1.0e-3
  num_negative: auto
train:
  model: TransE
""")
    cfg = cmd.load_config(str(p))
    assert os.path.isfile(cfg["graph"]["file_name"])  # dataset resolved
    assert cfg["build"]["num_negative"] == auto
    assert isinstance(cfg["build"]["optimizer"], Optimizer)
    assert cfg["build"]["optimizer"].lr == pytest.approx(1e-3)


def test_run_config_end_to_end(tmp_path):
    p = tmp_path / "tiny.yaml"
    p.write_text("""
application: knowledge graph
resource:
  dim: 16
graph:
  file_name: <math.train>
build:
  optimizer:
    type: Adam
    lr: 5.0e-3
  num_negative: 4
  batch_size: 512
  episode_size: 4
train:
  model: RotatE
  num_epoch: 10
  margin: 6
  log_frequency: 1000000
evaluate:
  task: link prediction
  file_name: <math.test>
  target: tail
  fast_mode: 50
save:
  file_name: %s
""" % (tmp_path / "m.pkl"))
    app, results = cmd.run_config(cmd.load_config(str(p)))
    assert results and "MRR" in results[0]
    assert os.path.isfile(tmp_path / "m.pkl")


def test_new_template(tmp_path):
    class A:
        application = ["knowledge", "graph"]
        file = str(tmp_path / "kg.yaml")
        force = False
    cmd.new_main(A)
    assert os.path.isfile(A.file)
    import yaml
    cfg = yaml.safe_load(open(A.file))
    assert cfg["application"] == "knowledge graph"


def test_visualize_subcommand(tmp_path):
    """`graphvite_tpu visualize <vectors> --label <labels> --save out.png`
    drives the full KNN -> LargeVis -> scatter pipeline from the CLI
    (ref cmd.py visualize)."""
    import numpy as np
    from graphvite_tpu import cmd

    rng = np.random.default_rng(0)
    vectors = np.concatenate([rng.normal(0, 1, (40, 8)),
                              rng.normal(5, 1, (40, 8))]).astype(np.float32)
    labels = np.array([0] * 40 + [1] * 40)
    vf = tmp_path / "vec.npy"
    lf = tmp_path / "lab.txt"
    out = tmp_path / "plot.png"
    np.save(vf, vectors)
    np.savetxt(lf, labels)
    cmd.main(["visualize", str(vf), "--label", str(lf),
              "--save", str(out), "--perplexity", "10"])
    assert out.exists() and out.stat().st_size > 0
