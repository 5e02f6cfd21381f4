"""URL download helpers (reference ``torch_geometric/data/download.py``).

This environment is zero-egress, so these raise at runtime when the
network is unreachable — datasets gate on already-present raw files —
but the API matches the reference so user code ports unchanged.
"""

import os
import os.path as osp
import ssl
import sys
import urllib.request
from typing import Optional


def download_url(url: str, folder: str, log: bool = True,
                 filename: Optional[str] = None) -> str:
    """Download ``url`` into ``folder`` and return the file path
    (reference ``download.py:13``). Skips the download when the target
    file already exists."""
    if filename is None:
        filename = url.rpartition('/')[2]
        filename = filename if filename[0] == '?' else filename.split('?')[0]
    path = osp.join(folder, filename)
    if osp.exists(path):
        if log and 'PYTEST_CURRENT_TEST' not in os.environ:
            print(f'Using existing file {filename}', file=sys.stderr)
        return path
    if log and 'PYTEST_CURRENT_TEST' not in os.environ:
        print(f'Downloading {url}', file=sys.stderr)
    os.makedirs(folder, exist_ok=True)
    ctx = ssl._create_unverified_context()
    with urllib.request.urlopen(url, context=ctx) as resp, \
            open(path, 'wb') as f:
        while True:
            chunk = resp.read(10 * 1024 * 1024)
            if not chunk:
                break
            f.write(chunk)
    return path


def download_google_url(id: str, folder: str, filename: str,
                        log: bool = True) -> str:
    """Download a Google-Drive hosted file by id (reference
    ``download.py:62``)."""
    url = f'https://drive.usercontent.google.com/download?id={id}&confirm=t'
    return download_url(url, folder, log, filename)
