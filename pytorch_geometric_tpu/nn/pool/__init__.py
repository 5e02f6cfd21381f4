from .glob import global_add_pool, global_mean_pool, global_max_pool
from .select import SelectOutput, SelectTopK, select_topk, filter_edges
from .topk_pool import TopKPooling, SAGPooling, PANPooling, PoolOutput
from .point import (knn, knn_graph, radius, radius_graph, fps, nearest,
                    voxel_grid, approx_knn, decimation_indices)
from .cluster_pool import (graclus, avg_pool, max_pool, avg_pool_x,
                           max_pool_x, EdgePooling, ASAPooling, MemPooling)

__all__ = [
    'global_add_pool', 'global_mean_pool', 'global_max_pool',
    'SelectOutput', 'SelectTopK', 'select_topk', 'filter_edges',
    'TopKPooling', 'SAGPooling', 'PANPooling', 'PoolOutput',
    'knn', 'knn_graph', 'radius', 'radius_graph', 'fps', 'nearest',
    'voxel_grid', 'approx_knn', 'decimation_indices', 'graclus', 'avg_pool', 'max_pool', 'avg_pool_x',
    'max_pool_x', 'EdgePooling', 'ASAPooling', 'MemPooling',
]
