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


def visualize_hetero_graph(
        edge_index_dict, edge_weight_dict, path: Optional[str] = None,
        backend: Optional[str] = None, node_labels_dict=None,
        node_weight_dict=None, node_size_range=(50, 500),
        node_opacity_range=(1.0, 1.0), edge_width_range=(0.1, 2.0),
        edge_opacity_range=(1.0, 1.0)):
    """Networkx rendering of a heterogeneous graph: one color per node
    type, per-type node labels, edge width/opacity scaled by weight
    (reference ``visualization/graph.py:155``). Returns the nx graph."""
    if backend is not None and backend != 'networkx':
        raise ValueError("Only the 'networkx' backend is supported for "
                         "heterogeneous graphs")
    import networkx as nx
    g = nx.DiGraph()

    def _lerp(v, vmin, vmax, lo, hi):
        if vmax <= vmin:
            return (lo + hi) / 2
        return lo + (hi - lo) * (v - vmin) / (vmax - vmin)

    all_w = [float(w) for et in edge_weight_dict
             for w in np.asarray(edge_weight_dict[et]).ravel()
             if w > 0]
    wmin, wmax = (min(all_w), max(all_w)) if all_w else (0.0, 1.0)

    for et, ei in edge_index_dict.items():
        src_t, rel, dst_t = et
        coo = np.asarray(ei.coo if hasattr(ei, 'coo') else ei)
        w = np.asarray(edge_weight_dict[et]).ravel()
        keep = w > 0
        for (s, d), wt in zip(coo[:, keep].T, w[keep]):
            for node, t in (((src_t, int(s)), src_t),
                            ((dst_t, int(d)), dst_t)):
                if node not in g:
                    labels = (node_labels_dict or {}).get(t)
                    nw = (node_weight_dict or {}).get(t)
                    g.add_node(
                        node, node_type=t,
                        label=(labels[node[1]] if labels else
                               f'{t}#{node[1]}'),
                        weight=(float(np.asarray(nw)[node[1]])
                                if nw is not None else 1.0))
            g.add_edge((src_t, int(s)), (dst_t, int(d)),
                       weight=float(wt),
                       width=_lerp(float(wt), wmin, wmax,
                                   *edge_width_range),
                       alpha=_lerp(float(wt), wmin, wmax,
                                   *edge_opacity_range))

    if path:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        types = sorted({d['node_type'] for _, d in g.nodes(data=True)})
        cmap = plt.get_cmap('tab10')
        colors = [cmap(types.index(d['node_type']) % 10)
                  for _, d in g.nodes(data=True)]
        nws = [d['weight'] for _, d in g.nodes(data=True)]
        nmin, nmax = (min(nws), max(nws)) if nws else (0, 1)
        sizes = [_lerp(v, nmin, nmax, *node_size_range) for v in nws]
        pos = nx.spring_layout(g, seed=0)
        widths = [d['width'] for _, _, d in g.edges(data=True)]
        nx.draw(g, pos, node_color=colors, node_size=sizes,
                width=widths,
                labels={n: d['label'] for n, d in g.nodes(data=True)},
                font_size=6)
        plt.savefig(path)
        plt.close()
    return g
