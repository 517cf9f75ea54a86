"""Generate the benchmark config tree (config/).

The YAMLs mirror the reference's experiment grid (reference config/*/*.yaml)
— same hyperparameter values so published metrics are reproducible — in this
framework's own layout. Run: python tools/gen_configs.py
"""
import os

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "config")

HEADER = "# graphvite_tpu baseline config (hyperparameters per reference %s)\n"


def emit(rel, ref, body):
    path = os.path.join(ROOT, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(HEADER % ref + body.lstrip())
    print("wrote", rel)


def graph_cfg(dataset_ref, model, dim=128, epochs=2000, episode="auto",
              aug=1, extra_train="", evaluate="", lr=0.025, wd=0.005):
    return f"""
application: graph

resource:
  dim: {dim}

graph:
  file_name: {dataset_ref}
  as_undirected: true

build:
  optimizer:
    type: SGD
    lr: {lr}
    weight_decay: {wd}
  num_partition: auto
  num_negative: 1
  batch_size: 100000
  episode_size: {episode}

train:
  model: {model}
  num_epoch: {epochs}
  negative_weight: 5
  augmentation_step: {aug}
  random_walk_length: 40
  random_walk_batch_size: 100{extra_train}
  log_frequency: 1000
{evaluate}"""


def kg_cfg(dataset, model, dim, opt_type, lr, neg, epochs, hyper,
           episode=1, extra=""):
    return f"""
application: knowledge graph

resource:
  dim: {dim}

graph:
  file_name: <{dataset}.train>

build:
  optimizer:
    type: {opt_type}
    lr: {lr}
    weight_decay: 0
  num_partition: auto
  num_negative: {neg}
  batch_size: 100000
  episode_size: {episode}

train:
  model: {model}
  num_epoch: {epochs}
  {hyper}
  adversarial_temperature: 2{extra}
  log_frequency: 100

evaluate:
  task: link prediction
  file_name: <{dataset}.test>
  filter_files:
    - <{dataset}.train>
    - <{dataset}.valid>
    - <{dataset}.test>
"""


def main():
    # -- demo --------------------------------------------------------------
    emit("demo/quick_start.yaml", "config/demo/quick_start.yaml", """
application: graph

resource:
  dim: 128

graph:
  file_name: <blogcatalog.train>
  as_undirected: true

build:
  optimizer:
    type: SGD
    lr: 0.025
    weight_decay: 0.005
  num_partition: auto
  num_negative: 1
  batch_size: 100000
  episode_size: 500

train:
  model: LINE
  num_epoch: 2000
  negative_weight: 5
  augmentation_step: 2
  random_walk_length: 40
  random_walk_batch_size: 100
  log_frequency: 1000

evaluate:
  - task: link prediction
    file_name: <blogcatalog.test>
    filter_file: <blogcatalog.train>
  - task: node classification
    file_name: <blogcatalog.label>
    portions: [0.2]
    times: 1

save:
  file_name: line_blogcatalog.pkl
""")

    emit("demo/math.yaml", "config/demo/math.yaml", """
application: knowledge graph

resource:
  dim: 512

graph:
  file_name: <math.train>

build:
  optimizer:
    type: Adam
    lr: 5.0e-3
    weight_decay: 0
  num_partition: auto
  num_negative: 8
  batch_size: 100000
  episode_size: 100

train:
  model: RotatE
  num_epoch: 2000
  margin: 9
  adversarial_temperature: 2
  log_frequency: 100

evaluate:
  task: link prediction
  file_name: <math.test>
  filter_files:
    - <math.train>
    - <math.valid>
    - <math.test>
  target: tail

save:
  file_name: rotate_math.pkl
""")

    # -- graph baselines ---------------------------------------------------
    yt_eval = """
evaluate:
  task: node classification
  file_name: <youtube.label>
  portions: [0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.10]
  times: 5
"""
    for model in ("LINE", "DeepWalk"):
        emit("graph/%s_youtube.yaml" % model.lower(),
             "config/graph/%s_youtube.yaml" % model.lower(),
             graph_cfg("<youtube.graph>", model, epochs=4000, episode=500,
                       aug=5, evaluate=yt_eval))
    emit("graph/node2vec_youtube.yaml", "config/graph/node2vec_youtube.yaml",
         graph_cfg("<youtube.graph>", "node2vec", epochs=4000, episode=500,
                   aug=5, extra_train="\n  p: 4\n  q: 2", evaluate=yt_eval))

    fl_eval = """
evaluate:
  task: node classification
  file_name: <flickr.label>
  portions: [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
  times: 5
"""
    for model in ("LINE", "DeepWalk"):
        emit("graph/%s_flickr.yaml" % model.lower(),
             "config/graph/%s_flickr.yaml" % model.lower(),
             graph_cfg("<flickr.graph>", model, epochs=2000, episode=1000,
                       aug=1, evaluate=fl_eval))

    fr_eval = """
evaluate:
  task: node classification
  file_name: <friendster.label>
  portions: [0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.1]
  times: 5
"""
    for model in ("LINE", "DeepWalk"):
        emit("graph/%s_friendster-small.yaml" % model.lower(),
             "config/graph/%s_friendster-small.yaml" % model.lower(),
             graph_cfg("<friendster.small_graph>", model, epochs=2000,
                       episode=3500, aug=1, evaluate=fr_eval))
        emit("graph/%s_friendster.yaml" % model.lower(),
             "config/graph/%s_friendster.yaml" % model.lower(),
             graph_cfg("<friendster.graph>", model, dim=96, epochs=2000,
                       episode=2500, aug=2, evaluate=fr_eval))
        emit("graph/%s_hyperlink-pld.yaml" % model.lower(),
             "config/graph/%s_hyperlink-pld.yaml" % model.lower(),
             graph_cfg("<hyperlink2012.pld_train>", model, epochs=2000,
                       episode=5000, aug=2, evaluate="""
evaluate:
  task: link prediction
  file_name: <hyperlink2012.pld_test>
  filter_file: <hyperlink2012.pld_train>
"""))

    # -- knowledge-graph baselines (values per reference grid) -------------
    margin = lambda m: "margin: %g" % m
    l3 = lambda x: "l3_regularization: %g" % x
    KG = {
        ("transe", "fb15k"): ("TransE", 1024, "Adam", "1.0e-5", 64, 1000, margin(24)),
        ("transe", "fb15k-237"): ("TransE", 1024, "Adam", "2.0e-6", 64, 1000, margin(9)),
        ("transe", "wn18"): ("TransE", 512, "Adam", "5.0e-6", 64, 4000, margin(12)),
        ("transe", "wn18rr"): ("TransE", 512, "Adam", "1.0e-6", 64, 6000, margin(6)),
        ("distmult", "fb15k"): ("DistMult", 2048, "Adam", "5.0e-5", 64, 1000, l3(1e-3)),
        ("distmult", "fb15k-237"): ("DistMult", 2048, "Adam", "2.0e-5", 64, 1000, l3(5e-3)),
        ("distmult", "wn18"): ("DistMult", 1024, "Adam", "1.0e-4", 64, 4000, l3(1e-3)),
        ("distmult", "wn18rr"): ("DistMult", 1024, "Adam", "2.0e-5", 64, 6000, l3(1e-2)),
        ("complex", "fb15k"): ("ComplEx", 2048, "Adam", "2.0e-4", 64, 1000, l3(1e-3)),
        ("complex", "fb15k-237"): ("ComplEx", 2048, "Adam", "2.0e-5", 64, 1000, l3(5e-3)),
        ("complex", "wn18"): ("ComplEx", 1024, "Adam", "1.0e-5", 64, 4000, l3(5e-5)),
        ("complex", "wn18rr"): ("ComplEx", 1024, "Adam", "1.0e-5", 64, 6000, l3(5e-6)),
        ("simple", "fb15k"): ("SimplE", 2048, "Adam", "2.0e-5", 64, 1000, l3(1e-3)),
        ("simple", "fb15k-237"): ("SimplE", 2048, "Adam", "2.0e-5", 64, 1000, l3(5e-3)),
        ("simple", "wn18"): ("SimplE", 1024, "Adam", "5.0e-5", 64, 4000, l3(2e-3)),
        ("simple", "wn18rr"): ("SimplE", 1024, "Adam", "1.0e-4", 64, 6000, l3(2e-3)),
        ("rotate", "fb15k"): ("RotatE", 2048, "Adam", "2.0e-4", 64, 1000, margin(24)),
        ("rotate", "fb15k-237"): ("RotatE", 2048, "Adam", "2.0e-6", 64, 1000, margin(9)),
        ("rotate", "wn18"): ("RotatE", 1024, "Adam", "5.0e-6", 64, 4000, margin(9)),
        ("rotate", "wn18rr"): ("RotatE", 1024, "Adam", "5.0e-6", 64, 6000, margin(6)),
        ("quate", "fb15k"): ("QuatE", 2048, "Adam", "5.0e-5", 64, 1000, l3(1e-2)),
        ("quate", "fb15k-237"): ("QuatE", 2048, "Adam", "1.0e-5", 64, 1000, l3(5e-2)),
        ("quate", "wn18"): ("QuatE", 1024, "Adam", "1.0e-5", 64, 4000, l3(1e-2)),
        ("quate", "wn18rr"): ("QuatE", 1024, "Adam", "5.0e-6", 64, 6000, l3(5e-2)),
    }
    WD5M = {
        "transe": ("TransE", 512, "SGD", "1.0e-3", 1000, margin(12),
                   "\n  relation_lr_multiplier: 0.01",
                   "adversarial_temperature: 0.5"),
        "distmult": ("DistMult", 512, "SGD", "0.1", 2000, l3(2e-3),
                     "\n  relation_lr_multiplier: 1.0e-4", None),
        "complex": ("ComplEx", 512, "SGD", "0.1", 1000, l3(2e-3),
                    "\n  relation_lr_multiplier: 1.0e-3",
                    "adversarial_temperature: 0.2"),
        "simple": ("SimplE", 512, "SGD", "1.0", 2000, l3(2e-3),
                   "\n  relation_lr_multiplier: 1.0e-4", None),
        "rotate": ("RotatE", 512, "SGD", "0.01", 1000, margin(6),
                   "\n  relation_lr_multiplier: 1.0", "adversarial_temperature: 0.2"),
        "quate": ("QuatE", 512, "SGD", "1.0", 2000, l3(5e-3),
                  "\n  relation_lr_multiplier: 1.0e-4",
                  "adversarial_temperature: 10"),
    }
    for (mk, dk), (model, dim, ot, lr, neg, ep, hyper) in KG.items():
        emit("knowledge_graph/%s_%s.yaml" % (mk, dk),
             "config/knowledge_graph/%s_%s.yaml" % (mk, dk),
             kg_cfg(dk, model, dim, ot, lr, neg, ep, hyper))
    for mk, (model, dim, ot, lr, ep, hyper, extra, at) in WD5M.items():
        body = kg_cfg("wikidata5m", model, dim, ot, lr, 64, ep, hyper,
                      episode=200, extra=extra)
        if at:
            body = body.replace("adversarial_temperature: 2", at)
        emit("knowledge_graph/%s_wikidata5m.yaml" % mk,
             "config/knowledge_graph/%s_wikidata5m.yaml" % mk, body)

    # -- visualization -----------------------------------------------------
    for dim, name, task in ((2, "largevis_mnist_2d", """
evaluate:
  task: visualization
  Y: <mnist.label_data>
  save_file: mnist_2d.png
"""), (3, "largevis_mnist_3d", """
evaluate:
  task: animation
  Y: <mnist.label_data>
  save_file: mnist_3d.gif
""")):
        emit("visualization/%s.yaml" % name,
             "config/visualization/%s.yaml" % name, f"""
application: visualization

resource:
  dim: {dim}

graph:
  vectors: <mnist.image_data>
  num_neighbor: 200
  perplexity: 20

build:
  optimizer:
    type: Adam
    lr: 0.5
    weight_decay: 1.0e-5
  num_partition: auto
  num_negative: 5
  batch_size: 100000
  episode_size: 200

train:
  model: LargeVis
  num_epoch: 50
  negative_weight: 3
  log_frequency: 1000
{task}
save:
  file_name: {name}.pkl
""")

    # -- word graph --------------------------------------------------------
    emit("word_graph/line_wikipedia.yaml",
         "config/word_graph/line_wikipedia.yaml", """
application: word graph

resource:
  dim: 128

graph:
  file_name: <wikipedia.graph>
  window: 5
  min_count: 5

build:
  optimizer:
    type: SGD
    lr: 0.025
    weight_decay: 0.005
  num_partition: auto
  num_negative: 1
  batch_size: 100000
  episode_size: 1000

train:
  model: LINE
  num_epoch: 80
  negative_weight: 5
  augmentation_step: 1
  log_frequency: 1000

save:
  file_name: line_wikipedia.pkl
""")

    # -- templates ---------------------------------------------------------
    emit("template/graph.yaml", "config/template/graph.yaml", """
application: graph

resource:
  dim: 128

graph:
  file_name:        # FILL ME
  as_undirected: true
  normalization: false

build:
  optimizer:
    type: SGD
    lr: 0.025
    weight_decay: 0.005
    schedule: linear
  num_partition: auto
  num_negative: 1
  batch_size: 100000
  episode_size: auto

train:
  model: DeepWalk   # DeepWalk | LINE | node2vec
  num_epoch: 2000
  resume: false
  negative_weight: 5
  negative_sample_exponent: 0.75
  augmentation_step: auto
  p: 1
  q: 1
  random_walk_length: 40
  random_walk_batch_size: 100
  log_frequency: 1000

evaluate:
  - task: node classification
    file_name:      # FILL ME
    portions: [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    times: 5

save:
  file_name: graph.pkl
""")
    emit("template/knowledge_graph.yaml",
         "config/template/knowledge_graph.yaml", """
application: knowledge graph

resource:
  dim: 512

graph:
  file_name:        # FILL ME
  normalization: false

build:
  optimizer:
    type: Adam
    lr: 5.0e-5
    weight_decay: 0
    schedule: linear
  num_partition: auto
  num_negative: 64
  batch_size: 100000
  episode_size: auto

train:
  model: RotatE     # TransE | DistMult | ComplEx | SimplE | RotatE | QuatE
  num_epoch: 1000
  resume: false
  margin: 12
  l3_regularization: 2.0e-3
  adversarial_temperature: 2
  relation_lr_multiplier: 1
  log_frequency: 100

evaluate:
  task: link prediction
  file_name:        # FILL ME
  filter_files: []
  target: both

save:
  file_name: knowledge_graph.pkl
""")
    emit("template/visualization.yaml", "config/template/visualization.yaml", """
application: visualization

resource:
  dim: 2

graph:
  vectors:          # FILL ME (.npy path or <dataset.key>)
  num_neighbor: 200
  perplexity: 30

build:
  optimizer:
    type: Adam
    lr: 0.5
    weight_decay: 1.0e-5
  num_partition: auto
  num_negative: 5
  batch_size: 100000
  episode_size: 200

train:
  model: LargeVis
  num_epoch: 50
  negative_weight: 3
  log_frequency: 1000

evaluate:
  task: visualization
  save_file: visualization.png

save:
  file_name: visualization.pkl
""")
    emit("template/word_graph.yaml", "config/template/word_graph.yaml", """
application: word graph

resource:
  dim: 128

graph:
  file_name:        # FILL ME (corpus text file)
  window: 5
  min_count: 5

build:
  optimizer:
    type: SGD
    lr: 0.025
    weight_decay: 0.005
  num_partition: auto
  num_negative: 1
  batch_size: 100000
  episode_size: auto

train:
  model: LINE
  num_epoch: 80
  negative_weight: 5
  augmentation_step: 1
  log_frequency: 1000

save:
  file_name: word_graph.pkl
""")


if __name__ == "__main__":
    main()
