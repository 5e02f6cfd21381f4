"""Mesh parsers: OFF / OBJ / PLY (reference ``torch_geometric/io/off.py``,
``obj.py``, ``ply.py``)."""

from typing import Optional

import numpy as np

from ..data.data import Data


def read_off(path: str) -> Data:
    """(reference ``io/off.py:read_off``)."""
    with open(path) as f:
        src = f.read().split('\n')
    if src[0].strip() == 'OFF':
        src = src[1:]
    else:
        src[0] = src[0][3:]
    counts = src[0].split()
    num_nodes, num_faces = int(counts[0]), int(counts[1])
    pos = np.array([[float(v) for v in line.split()[:3]]
                    for line in src[1:1 + num_nodes]], np.float32)
    faces = []
    for line in src[1 + num_nodes:1 + num_nodes + num_faces]:
        parts = [int(v) for v in line.split()]
        k = parts[0]
        poly = parts[1:k + 1]
        for i in range(1, k - 1):     # fan-triangulate
            faces.append([poly[0], poly[i], poly[i + 1]])
    face = (np.array(faces, np.int64).T if faces
            else np.zeros((3, 0), np.int64))
    return Data(pos=pos, face=face, num_nodes=num_nodes)


def write_off(data: Data, path: str):
    """(reference ``io/off.py:write_off``)."""
    pos = np.asarray(data.pos)
    face = np.asarray(data.face)
    with open(path, 'w') as f:
        f.write(f'OFF\n{len(pos)} {face.shape[1]} 0\n')
        for p in pos:
            f.write(' '.join(str(float(v)) for v in p) + '\n')
        for c in face.T:
            f.write('3 ' + ' '.join(str(int(v)) for v in c) + '\n')


def read_obj(path: str) -> Data:
    """(reference ``io/obj.py``)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == 'v':
                verts.append([float(v) for v in parts[1:4]])
            elif parts[0] == 'f':
                idx = [int(p.split('/')[0]) - 1 for p in parts[1:]]
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
    pos = np.array(verts, np.float32)
    face = (np.array(faces, np.int64).T if faces
            else np.zeros((3, 0), np.int64))
    return Data(pos=pos, face=face, num_nodes=len(verts))


def read_ply(path: str) -> Data:
    """ASCII PLY (reference ``io/ply.py``)."""
    with open(path, 'rb') as f:
        header = []
        while True:
            line = f.readline().decode('ascii').strip()
            header.append(line)
            if line == 'end_header':
                break
        counts = {}
        order = []
        for h in header:
            if h.startswith('element'):
                _, name, cnt = h.split()
                counts[name] = int(cnt)
                order.append(name)
        verts, faces = [], []
        for name in order:
            for _ in range(counts[name]):
                line = f.readline().decode('ascii').split()
                if name == 'vertex':
                    verts.append([float(v) for v in line[:3]])
                elif name == 'face':
                    k = int(line[0])
                    poly = [int(v) for v in line[1:k + 1]]
                    for i in range(1, k - 1):
                        faces.append([poly[0], poly[i], poly[i + 1]])
    pos = np.array(verts, np.float32)
    face = (np.array(faces, np.int64).T if faces
            else np.zeros((3, 0), np.int64))
    return Data(pos=pos, face=face, num_nodes=len(verts))
