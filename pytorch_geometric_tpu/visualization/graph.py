"""Graph visualization (reference
``torch_geometric/visualization/graph.py:24`` — graphviz/networkx
backends) and influence plots (``influence.py``)."""

from typing import Optional

import numpy as np


def visualize_graph(edge_index, edge_weight: Optional[np.ndarray] = None,
                    path: Optional[str] = None,
                    backend: Optional[str] = None,
                    node_labels: Optional[list] = None):
    """Render with networkx/matplotlib or graphviz; returns the figure
    or graph object (reference ``graph.py:24``)."""
    coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                     else edge_index)
    w = (np.asarray(edge_weight) if edge_weight is not None
         else np.ones(coo.shape[1]))
    keep = w > 1e-7
    coo, w = coo[:, keep], w[keep]

    if backend is None:
        try:
            import graphviz  # noqa: F401
            backend = 'graphviz'
        except ImportError:
            backend = 'networkx'

    if backend == 'graphviz':
        import graphviz
        g = graphviz.Digraph()
        for n in np.unique(coo):
            g.node(str(int(n)), (node_labels[int(n)]
                                 if node_labels else str(int(n))))
        for (s, d), wt in zip(coo.T, w):
            g.edge(str(int(s)), str(int(d)),
                   penwidth=str(max(0.1, 3 * float(wt))))
        if path:
            g.render(path.rsplit('.', 1)[0], cleanup=True,
                     format=path.rsplit('.', 1)[-1])
        return g

    import networkx as nx
    g = nx.DiGraph()
    for (s, d), wt in zip(coo.T, w):
        g.add_edge(int(s), int(d), weight=float(wt))
    if path:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        pos = nx.spring_layout(g, seed=0)
        widths = [3 * g[u][v]['weight'] for u, v in g.edges]
        nx.draw(g, pos, with_labels=True, width=widths,
                node_color='#8ecae6')
        plt.savefig(path)
        plt.close()
    return g


def influence(grad_sum: np.ndarray) -> np.ndarray:
    """Normalised influence scores (reference ``influence.py``)."""
    g = np.abs(np.asarray(grad_sum)).sum(-1)
    return g / max(g.sum(), 1e-12)
