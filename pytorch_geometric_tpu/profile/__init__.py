from .profile import (timeit, profileit, benchmark, trace,
                      count_model_params, edges_per_second)
from .profile import (count_flops, nvtxit, xpu_profile, count_parameters,
                      get_model_size, get_data_size,
                      get_cpu_memory_from_gc, get_gpu_memory_from_gc,
                      get_gpu_memory_from_nvidia_smi,
                      get_gpu_memory_from_ipex, get_stats_summary,
                      print_time_total, rename_profile_file,
                      torch_profile, trace_handler)
from .profiler import Profiler

__all__ = ['timeit', 'profileit', 'benchmark', 'trace',
           'count_model_params', 'edges_per_second', 'Profiler',
           'count_flops', 'nvtxit', 'xpu_profile', 'count_parameters',
           'get_model_size', 'get_data_size', 'get_cpu_memory_from_gc',
           'get_gpu_memory_from_gc', 'get_gpu_memory_from_nvidia_smi',
           'get_gpu_memory_from_ipex', 'get_stats_summary',
           'print_time_total', 'rename_profile_file', 'torch_profile',
           'trace_handler']
