"""Word co-occurrence graph (ref include/instance/word_graph.cuh:41-264).

Two-pass construction: (1) vocabulary count with `min_count` filter;
(2) window-based pair counting where multiple occurrences of the same pair
accumulate into the edge weight (the reference's "compact" variant,
word_graph.cuh:73-166). Co-occurrences are counted symmetrically (both
(u,v) and (v,u) get weight), so the graph is stored directed with both
orientations present.
"""
from __future__ import annotations

import numpy as np

from graphvite_tpu.graph import Graph
from graphvite_tpu.utils.common import logger


class WordGraph(Graph):

    def load_file(self, file_name, window=5, min_count=5, normalization=False,
                  delimiters=None, comment="#"):
        logger.info("generating graph from corpus %s", file_name)
        self.clear()
        self.normalization = normalization
        self.as_undirected = True

        from graphvite_tpu.graph import _make_tokenizer
        tokenize = _make_tokenizer(delimiters)
        # pass 1: vocabulary
        freq = {}
        with open(file_name) as f:
            for line in f:
                ci = line.find(comment)
                if ci >= 0:
                    line = line[:ci]
                for word in tokenize(line):
                    freq[word] = freq.get(word, 0) + 1
        id2name = [w for w, c in freq.items() if c >= min_count]
        name2id = {w: i for i, w in enumerate(id2name)}
        self.id2name = id2name
        self.name2id = name2id
        self.num_vertex = len(id2name)

        # pass 2: windowed pair counting (both directions accumulate)
        pair_count = {}
        with open(file_name) as f:
            for line in f:
                ci = line.find(comment)
                if ci >= 0:
                    line = line[:ci]
                sent = [name2id[w] for w in
                        tokenize(line)
                        if w in name2id]
                for i, u in enumerate(sent):
                    for j in range(1, window + 1):
                        if i + j >= len(sent):
                            break
                        v = sent[i + j]
                        pair_count[(u, v)] = pair_count.get((u, v), 0) + 1
                        pair_count[(v, u)] = pair_count.get((v, u), 0) + 1

        if pair_count:
            items = np.array([(u, v, c) for (u, v), c in pair_count.items()],
                             dtype=np.float64)
            self.edge_heads = items[:, 0].astype(np.int64)
            self.edge_tails = items[:, 1].astype(np.int64)
            self.edge_weights = items[:, 2].astype(np.float32)
        self.num_edge = self.edge_heads.size
        self._finalize(normalization)
        logger.info(self.info())
        return self

    load_file_compact = load_file

    def info(self):
        return ("#vertex: %d, #edge: %d\nnormalization: %s"
                % (self.num_vertex, self.num_edge,
                   "yes" if self.normalization else "no"))
