"""Graph-RAG retrieval pipeline: index a knowledge graph, embed the
nodes, answer a paraphrased question via KNN seeds + neighbor-sampled
subgraph retrieval.

Reference analog: ``examples/llm/g_retriever.py`` +
``torch_geometric/llm/utils`` stores. Zero-egress: a bag-of-concepts
encoder stands in for the sentence transformer (swap in
``pytorch_geometric_tpu.llm.SentenceTransformer`` when HF weights are
available).

Run: JAX_PLATFORMS=cpu python examples/rag_retrieval.py
"""
import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')

from pytorch_geometric_tpu.llm import (KNNRAGFeatureStore,  # noqa: E402
                                       LargeGraphIndexer,
                                       NeighborSamplingRAGGraphStore,
                                       RAGQueryLoader)
from pytorch_geometric_tpu.llm.rag import EDGE_RELATION, NODE_PID  # noqa


class ConceptEncoder:
    """Toy sentence encoder: words hash into concept buckets, synonyms
    share a bucket — enough for the demo's paraphrase retrieval."""

    SYN = {'radium': 0, 'glowing-metal': 0, 'curie': 1,
           'researcher': 2, 'scientist': 2, 'discovered': 3,
           'found': 3, 'unearthed': 3, 'warsaw': 4}
    dim = 16

    def encode(self, sentences):
        if isinstance(sentences, str):
            sentences = [sentences]
        out = np.zeros((len(sentences), self.dim), np.float32)
        for i, s in enumerate(sentences):
            for w in s.lower().replace('?', '').split():
                if w in self.SYN:            # concept words dominate
                    out[i, self.SYN[w]] += 1.0
                else:                        # filler/stop words: faint
                    out[i, 5 + hash(w) % (self.dim - 5)] += 0.1
        return out


def main():
    rng = np.random.default_rng(0)
    filler = sorted({(f'e{a}', f'r{b % 5}', f'e{c}')
                     for a, b, c in rng.integers(0, 200, (800, 3))
                     if a != c})
    planted = [('curie', 'discovered', 'radium'),
               ('curie', 'born_in', 'warsaw')]
    indexer = LargeGraphIndexer.from_triplets(filler + planted)
    enc = ConceptEncoder()
    pids = indexer.get_node_features(NODE_PID)
    indexer.add_node_feature('x', enc.encode(pids))
    indexer.add_edge_feature(
        'edge_attr', enc.encode(indexer.get_edge_features(EDGE_RELATION)))
    data = indexer.to_data('x', 'edge_attr')
    print(f'KG: {indexer.num_nodes} nodes / {indexer.num_edges} edges')

    fstore = KNNRAGFeatureStore()
    fstore.put_tensor(np.asarray(data.x), 'node', 'x')
    fstore.put_tensor(np.asarray(data.edge_attr), 'edge', 'edge_attr')
    gstore = NeighborSamplingRAGGraphStore()
    gstore.edge_index = np.asarray(data.edge_index)
    loader = RAGQueryLoader(
        (fstore, gstore),
        config={'k_nodes': 2, 'encoder_model': enc,
                'num_neighbors': [6, 6]})

    question = 'which researcher unearthed the glowing-metal?'
    sub = loader.query(question)
    names = {pids[i] for i in np.asarray(sub.node_idx)}
    print(f'question: {question!r}')
    print(f'retrieved subgraph: {int(sub.num_nodes)} nodes, '
          f'{np.asarray(sub.edge_index).shape[1]} edges')
    print('answer chain retrieved:',
          {'curie', 'radium'} <= names)


if __name__ == '__main__':
    main()
