from .graph import visualize_graph, visualize_hetero_graph, influence

__all__ = ['visualize_graph', 'visualize_hetero_graph', 'influence']
