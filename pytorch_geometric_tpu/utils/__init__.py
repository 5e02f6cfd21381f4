from .core import (degree, cumsum, one_hot, index_sort, lexsort,
                   scatter_normalize, maybe_num_nodes)
from .loop import (add_self_loops, add_remaining_self_loops,
                   remove_self_loops, mask_self_loops, contains_self_loops)
from .coalesce import (sort_edge_index, coalesce, to_undirected,
                       is_undirected, contains_isolated_nodes,
                       remove_isolated_nodes)
from .dense import to_dense_batch, to_dense_adj, dense_to_sparse
from .subgraph import subgraph, k_hop_subgraph, bipartite_subgraph
from .random import (dropout_edge, dropout_node, negative_sampling,
                     batched_negative_sampling)
from .extra import (get_laplacian, homophily, assortativity, map_index,
                    ppr, trim_to_layer, train_test_split_edges,
                    normalized_cut, unbatch, unbatch_edge_index,
                    shuffle_node, mask_feature)
from .convert import (to_scipy_sparse_matrix, from_scipy_sparse_matrix,
                      to_networkx, from_networkx)

# Re-export the reduction substrate at utils level like the reference
# (torch_geometric/utils/__init__.py exports scatter/segment/softmax/spmm).
from ..ops import (scatter, scatter_argmax, group_argsort, segment,
                   segment_logsumexp, ptr2index, index2ptr, softmax, spmm)
from .misc import (index_to_mask, mask_to_index, mask_select, narrow,
                   select,
                   add_random_edge, dropout_path, get_self_loop_attr,
                   segregate_self_loops, normalize_edge_index,
                   get_num_hops, erdos_renyi_graph, barabasi_albert_graph,
                   stochastic_blockmodel_graph,
                   structured_negative_sampling,
                   structured_negative_sampling_feasible, grid,
                   get_mesh_laplacian, geodesic_distance,
                   to_nested_tensor, from_nested_tensor, to_edge_index,
                   to_scipy_coo, to_scipy_csr, to_scipy_csc,
                   to_torch_coo_tensor, to_torch_csr_tensor,
                   to_torch_csc_tensor, to_torch_sparse_tensor,
                   is_sparse, is_torch_sparse_tensor, get_embeddings,
                   total_influence, get_embeddings_hetero,
                   from_smiles, from_rdmol, to_smiles,
                   to_rdmol, tree_decomposition, to_dgl, from_dgl,
                   to_cugraph, from_cugraph, to_networkit,
                   from_networkit, to_trimesh, from_trimesh, group_cat)

__all__ = [
    'index_to_mask', 'mask_to_index', 'mask_select', 'narrow', 'select',
    'add_random_edge', 'dropout_path', 'get_self_loop_attr',
    'segregate_self_loops', 'normalize_edge_index', 'get_num_hops',
    'erdos_renyi_graph', 'barabasi_albert_graph',
    'stochastic_blockmodel_graph', 'structured_negative_sampling',
    'structured_negative_sampling_feasible', 'grid',
    'get_mesh_laplacian', 'geodesic_distance', 'to_nested_tensor',
    'from_nested_tensor', 'to_edge_index', 'to_scipy_coo',
    'to_scipy_csr', 'to_scipy_csc', 'to_torch_coo_tensor',
    'to_torch_csr_tensor', 'to_torch_csc_tensor',
    'to_torch_sparse_tensor', 'is_sparse', 'is_torch_sparse_tensor',
    'get_embeddings', 'total_influence', 'get_embeddings_hetero', 'from_smiles', 'from_rdmol',
    'to_smiles', 'to_rdmol', 'tree_decomposition', 'to_dgl', 'from_dgl',
    'to_cugraph', 'from_cugraph', 'to_networkit', 'from_networkit',
    'to_trimesh', 'from_trimesh', 'group_cat', 'dropout_adj',
    'get_ppr',
    'degree', 'cumsum', 'one_hot', 'index_sort', 'lexsort',
    'scatter_normalize', 'maybe_num_nodes',
    'add_self_loops', 'add_remaining_self_loops', 'remove_self_loops',
    'mask_self_loops', 'contains_self_loops',
    'sort_edge_index', 'coalesce', 'to_undirected', 'is_undirected',
    'contains_isolated_nodes', 'remove_isolated_nodes',
    'to_dense_batch', 'to_dense_adj', 'dense_to_sparse',
    'subgraph', 'k_hop_subgraph', 'bipartite_subgraph',
    'dropout_edge', 'dropout_node', 'negative_sampling',
    'batched_negative_sampling',
    'get_laplacian', 'homophily', 'assortativity', 'map_index', 'ppr',
    'trim_to_layer', 'train_test_split_edges', 'normalized_cut',
    'unbatch', 'unbatch_edge_index', 'shuffle_node', 'mask_feature',
    'to_scipy_sparse_matrix', 'from_scipy_sparse_matrix', 'to_networkx',
    'from_networkx',
    'scatter', 'scatter_argmax', 'group_argsort', 'segment',
    'segment_logsumexp', 'ptr2index', 'index2ptr', 'softmax', 'spmm',
]

from .reorder import (reverse_cuthill_mckee, degree_order, cluster_order,
                      apply_node_permutation, block_fill_stats)
__all__ += ['reverse_cuthill_mckee', 'degree_order', 'cluster_order',
            'apply_node_permutation', 'block_fill_stats']

# reference-name aliases
from .random import dropout_edge as dropout_adj  # deprecated alias
from .extra import ppr as get_ppr
