from .profile import (timeit, profileit, benchmark, trace,
                      count_model_params, edges_per_second)
from .profile import count_flops, nvtxit, xpu_profile
from .profiler import Profiler

__all__ = ['timeit', 'profileit', 'benchmark', 'trace',
           'count_model_params', 'edges_per_second', 'Profiler',
           'count_flops', 'nvtxit', 'xpu_profile']
