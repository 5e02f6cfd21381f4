"""Native (C++) host kernels, loaded via ctypes.

The reference keeps its native samplers in pyg-lib
(``torch.ops.pyg.neighbor_sample``); here a small C ABI library is
compiled on first use with g++ (no pybind dependency) and cached next to
the source. Every caller has a numpy fallback, mirroring the reference's
``WITH_*`` capability-flag discipline (``torch_geometric/typing.py``).
"""

import ctypes
import os
import os.path as osp
import subprocess
import threading

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, 'sampler.cpp')
_SRC2 = osp.join(_HERE, 'partition.cpp')
_LIB = osp.join(_HERE, 'libpgt_sampler.so')
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-march=native', '-shared', '-fPIC',
             '-std=c++17', _SRC, _SRC2, '-o', _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load():
    """Return the ctypes library or None (fallback to numpy paths)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not osp.exists(_LIB) or (osp.getmtime(_LIB)
                                    < max(osp.getmtime(_SRC),
                                          osp.getmtime(_SRC2))):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        if not hasattr(lib, 'multilevel_partition'):
            # stale .so from before partition.cpp (mtime check can be
            # fooled by archive extraction): force one rebuild
            del lib
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_LIB)
            except OSError:
                return None
            if not hasattr(lib, 'multilevel_partition'):
                return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.neighbor_sample.restype = ctypes.c_int64
        lib.neighbor_sample.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64,          # csc, n
            i64p, ctypes.c_int64,                      # seeds
            i64p, ctypes.c_int64,                      # fanouts
            i64p, ctypes.c_int64, ctypes.c_int64,      # caps
            ctypes.c_int, ctypes.c_uint64,             # replace, seed
            i64p, u8p, i64p, i64p, i64p, u8p,          # outputs
            i64p, i64p,
        ]
        i64pp = ctypes.POINTER(i64p)
        u8pp = ctypes.POINTER(u8p)
        lib.hetero_neighbor_sample.restype = ctypes.c_int64
        lib.hetero_neighbor_sample.argtypes = [
            ctypes.c_int64, ctypes.c_int64,            # T, R
            i64pp, i64pp, i64pp,                       # colptrs, rows, eids
            i64p, i64p,                                # src_type, dst_type
            ctypes.c_int64, i64p, ctypes.c_int64,      # input_type, seeds
            i64p, ctypes.c_int64,                      # fanouts, H
            i64p, i64p,                                # n_caps, ecap_hop
            ctypes.c_int, ctypes.c_uint64,             # replace, seed
            i64pp, u8pp,                               # node_out, node_mask
            i64pp, i64pp, i64pp, u8pp,                 # row/col/eid/mask
            i64p, i64p,                                # nsn, nse
        ]
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.neighbor_sample_tw.restype = ctypes.c_int64
        lib.neighbor_sample_tw.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64,          # csc, n
            i64p, ctypes.c_int64, f64p,                # seeds, seed_time
            i64p, ctypes.c_int64,                      # fanouts
            i64p, ctypes.c_int64, ctypes.c_int64,      # caps
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # replace/disj/strat
            f64p, f64p, f64p,                          # node/edge time, w
            ctypes.c_uint64,                           # seed
            i64p, i64p, u8p,                           # node, batch, mask
            i64p, i64p, i64p, u8p,                     # row/col/eid/mask
            i64p, i64p,
        ]
        f64p_ = ctypes.POINTER(ctypes.c_double)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.multilevel_partition.restype = None
        lib.multilevel_partition.argtypes = [
            i64p, i64p, f64p_, ctypes.c_int64,      # csr, n
            ctypes.c_int64, ctypes.c_uint64,        # parts, seed
            ctypes.c_double, i32p,                  # imbalance, out
        ]
        lib.random_walk.restype = None
        lib.random_walk.argtypes = [
            i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_uint64, i64p,
        ]
        _lib = lib
        return _lib


WITH_NATIVE_SAMPLER = load() is not None
