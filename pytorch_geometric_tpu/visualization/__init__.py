from .graph import visualize_graph, influence

__all__ = ['visualize_graph', 'influence']
