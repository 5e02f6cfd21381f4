"""Text parsers (reference ``torch_geometric/io/txt_array.py``)."""

from typing import Optional, Sequence

import numpy as np


def parse_txt_array(src: Sequence[str], sep: Optional[str] = None,
                    start: int = 0, end: Optional[int] = None,
                    dtype=np.float32) -> np.ndarray:
    return np.array([[float(x) for x in line.split(sep)[start:end]]
                     for line in src], dtype)


def read_txt_array(path: str, sep: Optional[str] = None, start: int = 0,
                   end: Optional[int] = None,
                   dtype=np.float32) -> np.ndarray:
    with open(path) as f:
        src = [line for line in f.read().split('\n') if line.strip()]
    return parse_txt_array(src, sep, start, end, dtype)
