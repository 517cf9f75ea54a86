"""Word-graph END-TO-END protocol run (VERDICT r4 item 8): corpus ->
co-occurrence graph -> LINE training -> pickle + word2vec export, at the
config/word_graph/line_wikipedia.yaml hyperparameters (SGD 0.025/wd 5e-3,
K=1, negative_weight 5, aug 1, 80 epochs, window 5, min_count 5).

No egress, so no Wikipedia: the corpus is synthetic with PLANTED topic
structure — sentences are drawn from 50 topics, each word's topic drawn
once (Zipf unigram frequencies), so co-occurrence concentrates within
topics and the trained embeddings carry a checkable signal. The sanity
probe reports mean cosine similarity of same-topic frequent-word pairs vs
random pairs (analogy/similarity stand-in; the reference ships no word
eval task either — its word-graph app reuses the graph app,
application.py:536-573).

Usage: python tools/word_graph_e2e.py [--tokens 20000000] [--vocab 100000]
Prints one JSON line for RESULTS.md.
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TOPIC = 50


def write_corpus(path, n_tokens, vocab, seed=0, sent_len=20,
                 topic_purity=0.7):
    rng = np.random.default_rng(seed)
    # Zipf unigram distribution; each word belongs to one topic
    freq = 1.0 / (np.arange(1, vocab + 1) ** 1.05)
    freq /= freq.sum()
    word_topic = rng.integers(0, N_TOPIC, vocab)
    # per-topic word distributions: renormalized unigram within topic
    topic_words = [np.flatnonzero(word_topic == t) for t in range(N_TOPIC)]
    topic_p = [freq[tw] / freq[tw].sum() for tw in topic_words]
    n_sent = n_tokens // sent_len
    chunk = 20000
    t0 = time.time()
    with open(path, "w") as f:
        for lo in range(0, n_sent, chunk):
            m = min(chunk, n_sent - lo)
            topics = rng.integers(0, N_TOPIC, m)
            rows = []
            for t in range(N_TOPIC):
                idx = np.flatnonzero(topics == t)
                if not idx.size:
                    continue
                pure = rng.random((idx.size, sent_len)) < topic_purity
                in_topic = topic_words[t][rng.choice(
                    topic_words[t].size, (idx.size, sent_len),
                    p=topic_p[t])]
                backgr = rng.choice(vocab, (idx.size, sent_len), p=freq)
                words = np.where(pure, in_topic, backgr)
                for i, row in zip(idx, words):
                    rows.append((i, row))
            rows.sort()
            f.write("".join(
                " ".join("w%d" % w for w in row) + "\n" for _, row in rows))
    return word_topic, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=20_000_000)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=80)
    args = ap.parse_args()

    from graphvite_tpu.application import Application

    tmp = tempfile.mkdtemp(prefix="wordgraph_")
    corpus = os.path.join(tmp, "corpus.txt")
    word_topic, gen_s = write_corpus(corpus, args.tokens, args.vocab)

    app = Application("word graph", dim=128, float_type="bfloat16")
    t0 = time.time()
    app.load(file_name=corpus, window=5, min_count=5)
    build_s = time.time() - t0
    g = app.graph
    app.build(optimizer={"type": "SGD", "lr": 0.025, "weight_decay": 5e-3},
              num_negative=1, batch_size=250_000, episode_size=50)
    t1 = time.time()
    app.train(model="LINE", num_epoch=args.epochs, negative_weight=5,
              augmentation_step=1, log_frequency=5000)
    train_s = time.time() - t1

    t2 = time.time()
    model_path = os.path.join(tmp, "line_corpus.pkl")
    w2v_path = os.path.join(tmp, "line_corpus.w2v")
    app.save_model(model_path)
    app.solver.save_embeddings(w2v_path)
    save_s = time.time() - t2

    # sanity probe: same-topic frequent-word cosine vs random-pair cosine
    emb = app.solver.vertex_embeddings
    emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    name2id = g.name2id
    rng = np.random.default_rng(1)
    same, rand = [], []
    for _ in range(2000):
        t = rng.integers(N_TOPIC)
        tw = np.flatnonzero(word_topic == t)[:200]  # frequent ids are low
        a, b = rng.choice(tw, 2, replace=False)
        na, nb = "w%d" % a, "w%d" % b
        if na in name2id and nb in name2id:
            same.append(float(emb[name2id[na]] @ emb[name2id[nb]]))
        x, y = rng.choice(args.vocab, 2, replace=False)
        nx, ny = "w%d" % x, "w%d" % y
        if nx in name2id and ny in name2id:
            rand.append(float(emb[name2id[nx]] @ emb[name2id[ny]]))
    samples = app.solver.num_batch * app.solver.effective_batch
    print(json.dumps({
        "config": "word_graph/line_wikipedia.yaml (synthetic topic corpus)",
        "tokens": args.tokens, "vocab_kept": g.num_vertex,
        "edges": g.num_edge,
        "corpus_gen_s": round(gen_s, 1),
        "graph_build_s": round(build_s, 1),
        "train_s": round(train_s, 1),
        "samples_per_s": round(samples / train_s, 1),
        "save_s": round(save_s, 1),
        "w2v_bytes": os.path.getsize(w2v_path),
        "same_topic_cos": round(float(np.mean(same)), 4),
        "random_pair_cos": round(float(np.mean(rand)), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
