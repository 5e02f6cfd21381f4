from .profile import (timeit, profileit, benchmark, trace,
                      count_model_params, edges_per_second)

__all__ = ['timeit', 'profileit', 'benchmark', 'trace',
           'count_model_params', 'edges_per_second']
