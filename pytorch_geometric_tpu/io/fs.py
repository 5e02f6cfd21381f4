"""fsspec filesystem abstraction (reference ``torch_geometric/io/fs.py``).

Path-URI dispatch so dataset roots can live on any fsspec backend
(local, memory://, http(s)://, gs://, s3://). Arrays are (de)serialised
with numpy/pickle instead of ``torch.save`` — the on-disk artifacts of
this framework are plain pytrees."""

import io as _io
import os.path as osp
import pickle
import sys
from typing import Any, Dict, List, Optional, Union

try:
    import fsspec
    _HAS_FSSPEC = True
except ImportError:          # pragma: no cover - baked into this env
    fsspec = None
    _HAS_FSSPEC = False

DEFAULT_CACHE_PATH = '/tmp/pgt_simplecache'


def get_fs(path: str) -> 'fsspec.AbstractFileSystem':
    """Filesystem backend for a path URI (reference ``fs.py:21``)."""
    if not _HAS_FSSPEC:
        raise ImportError("'get_fs' requires the 'fsspec' package")
    return fsspec.core.url_to_fs(path)[0]


def normpath(path: str) -> str:
    if isdisk(path):
        return osp.normpath(path)
    return path


def exists(path: str) -> bool:
    return get_fs(path).exists(path)


def makedirs(path: str, exist_ok: bool = True) -> None:
    return get_fs(path).makedirs(path, exist_ok)


def isdir(path: str) -> bool:
    return get_fs(path).isdir(path)


def isfile(path: str) -> bool:
    return get_fs(path).isfile(path)


def isdisk(path: str) -> bool:
    return 'file' in get_fs(path).protocol


def islocal(path: str) -> bool:
    return isdisk(path) or 'memory' in get_fs(path).protocol


def ls(path: str, detail: bool = False) -> Union[List[str],
                                                 List[Dict[str, Any]]]:
    fs = get_fs(path)
    outputs = fs.ls(path, detail=detail)
    if not isdisk(path):
        if detail:
            for output in outputs:
                output['name'] = fs.unstrip_protocol(output['name'])
        else:
            outputs = [fs.unstrip_protocol(o) for o in outputs]
    return outputs


def cp(path1: str, path2: str, extract: bool = False,
       log: bool = True, use_cache: bool = True,
       clear_cache: bool = True) -> None:
    """Copy (and optionally extract) ``path1`` -> ``path2`` across
    filesystems (reference ``fs.py:117``)."""
    kwargs: Dict[str, Any] = {}
    is_path1_dir = isdir(path1)
    is_path2_dir = isdir(path2)

    # cache remote archives locally before extraction:
    if not islocal(path1):
        if log and 'pytest' not in sys.modules:
            print(f'Downloading {path1}', file=sys.stderr)
        if extract and use_cache:
            kwargs.setdefault('simplecache',
                              dict(cache_storage=DEFAULT_CACHE_PATH))
            path1 = f'simplecache::{path1}'
    if extract and path1.endswith('.tar.gz'):
        kwargs.setdefault('tar', dict(compression='gzip'))
        path1 = f'tar://**::{path1}'
    elif extract and path1.endswith('.zip'):
        path1 = f'zip://**::{path1}'
    elif extract and path1.endswith('.gz'):
        kwargs.setdefault('compression', 'infer')

    multiple_files = '*' in path1
    open_files = fsspec.open_files(path1, **kwargs)
    with open_files as of:
        for f_from, open_file in zip(of, open_files):
            with open_file as f_from:
                to_path = path2
                if multiple_files:
                    common = osp.commonprefix(
                        [of2.path for of2 in open_files])
                    to_path = osp.join(path2,
                                       open_file.path[len(common):])
                elif is_path2_dir:
                    to_path = osp.join(path2, osp.basename(path1))
                fs2 = get_fs(to_path)
                if not fs2.exists(osp.dirname(to_path)):
                    fs2.makedirs(osp.dirname(to_path), exist_ok=True)
                with fs2.open(to_path, 'wb') as f_to:
                    while True:
                        chunk = f_from.read(10 * 1024 * 1024)
                        if not chunk:
                            break
                        f_to.write(chunk)
    if clear_cache and use_cache and exists(DEFAULT_CACHE_PATH):
        try:
            rm(DEFAULT_CACHE_PATH)
        except PermissionError:      # pragma: no cover
            pass


def rm(path: str, recursive: bool = True) -> None:
    get_fs(path).rm(path, recursive)


def mv(path1: str, path2: str) -> None:
    fs1, fs2 = get_fs(path1), get_fs(path2)
    assert fs1.protocol == fs2.protocol
    fs1.mv(path1, path2)


def glob(path: str) -> List[str]:
    fs = get_fs(path)
    out = fs.glob(path)
    if not isdisk(path):
        out = [fs.unstrip_protocol(p) for p in out]
    return out


def save(data: Any, path: str) -> None:
    """Pickle a pytree of numpy/jax arrays to any fsspec path."""
    buf = _io.BytesIO()
    pickle.dump(data, buf, protocol=pickle.HIGHEST_PROTOCOL)
    with fsspec.open(path, 'wb') as f:
        f.write(buf.getvalue())


def load(path: str) -> Any:
    with fsspec.open(path, 'rb') as f:
        return pickle.load(f)


def torch_save(data: Any, path: str) -> None:
    """Reference-compatible alias (``fs.py:torch_save``)."""
    save(data, path)


def torch_load(path: str, map_location: Optional[Any] = None) -> Any:
    del map_location
    return load(path)
