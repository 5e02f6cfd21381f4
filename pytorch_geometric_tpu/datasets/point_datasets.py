"""Point-cloud / mesh dataset long tail.

Reference: ``torch_geometric/datasets/`` — geometric_shapes.py (OFF),
shrec2016.py (OFF), tosca.py (mat), coma.py (PLY), dynamic_faust.py
(hdf5-gated), med_shape_net.py, pcpnet_dataset.py (xyz+normals txt),
s3dis.py (h5/npy), shapenet.py (txt point clouds), pascal_pf.py (mat),
willow.py (mat), teeth3ds.py (obj). Zero-egress: raws under
``root/raw``; directory-scan based (one mesh file per example).
"""

import os
import os.path as osp
from typing import Sequence

import numpy as np

from ..data.data import Data
from ..data.dataset import Dataset
from ..io.mesh import read_off, read_obj, read_ply


class _MeshFolder(Dataset):
    """Scan ``raw/`` for mesh files; each file is one example, labeled
    by its subdirectory name."""

    extensions = ('.off',)
    reader = staticmethod(read_off)

    def __init__(self, root: str, transform=None, pre_transform=None):
        self.root = root
        self.transform = transform
        self.pre_transform = pre_transform
        self.pre_filter = None
        os.makedirs(self.raw_dir, exist_ok=True)
        self.paths, labels = [], []
        for dirpath, _, files in sorted(os.walk(self.raw_dir)):
            for f in sorted(files):
                if f.lower().endswith(self.extensions):
                    self.paths.append(osp.join(dirpath, f))
                    labels.append(osp.basename(dirpath))
        if not self.paths:
            raise RuntimeError(
                f'{type(self).__name__}: no mesh files under '
                f'{self.raw_dir} (zero-egress: place raws manually)')
        classes = sorted(set(labels))
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.labels = [self.class_to_idx[l] for l in labels]

    @property
    def raw_dir(self):
        return osp.join(self.root, 'raw')

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        d = self.reader(self.paths[idx])
        d.y = np.asarray([self.labels[idx]])
        if self.pre_transform is not None:
            d = self.pre_transform(d)
        if self.transform is not None:
            d = self.transform(d)
        return d


class GeometricShapes(_MeshFolder):
    """40 2D/3D shape categories (reference ``geometric_shapes.py``)."""


class SHREC2016(_MeshFolder):
    """Partial mesh retrieval benchmark (reference ``shrec2016.py``)."""


class MedShapeNet(_MeshFolder):
    """Medical shape meshes (reference ``med_shape_net.py``)."""


class Teeth3DS(_MeshFolder):
    """Intraoral scans (reference ``teeth3ds.py``)."""
    extensions = ('.obj',)
    reader = staticmethod(read_obj)


class CoMA(_MeshFolder):
    """Facial expression meshes (reference ``coma.py``)."""
    extensions = ('.ply',)
    reader = staticmethod(read_ply)


class TOSCA(Dataset):
    """Non-rigid shape pairs (reference ``tosca.py`` — .mat vertices +
    triangles per figure)."""

    def __init__(self, root: str, categories: Sequence[str] = ('cat',),
                 transform=None, pre_transform=None):
        from scipy.io import loadmat
        self.root = root
        self.transform = transform
        self.pre_filter = None
        self.graphs = []
        raw = osp.join(root, 'raw')
        names = sorted(f[:-9] for f in os.listdir(raw)
                       if f.endswith('.vert.mat')) if osp.isdir(raw) \
            else []
        if not names:
            raise RuntimeError(f'TOSCA: no .vert.mat files under {raw}')
        for name in names:
            if not any(name.startswith(c) for c in categories):
                continue
            v = loadmat(osp.join(raw, f'{name}.vert.mat'))
            t = loadmat(osp.join(raw, f'{name}.tri.mat'))
            pos = np.asarray(next(x for x in v.values()
                                  if isinstance(x, np.ndarray)
                                  and x.ndim == 2), np.float32)
            tri = np.asarray(next(x for x in t.values()
                                  if isinstance(x, np.ndarray)
                                  and x.ndim == 2), np.int64) - 1
            d = Data(pos=pos, face=tri.T, num_nodes=pos.shape[0])
            if pre_transform is not None:
                d = pre_transform(d)
            self.graphs.append(d)

    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, idx):
        d = self.graphs[idx]
        return d if self.transform is None else self.transform(d)


class PCPNetDataset(Dataset):
    """Point clouds with normals/curvature (reference
    ``pcpnet_dataset.py`` — .xyz + .normals text files listed in a
    split file)."""

    def __init__(self, root: str, category: str = 'Noisy',
                 split: str = 'train', transform=None, **kw):
        self.root = root
        self.transform = transform
        raw = osp.join(root, 'raw')
        listfile = osp.join(raw, f'list/{split}.txt')
        if not osp.exists(listfile):
            raise RuntimeError(f'PCPNet: missing split list {listfile}')
        with open(listfile) as f:
            self.names = [l.strip() for l in f if l.strip()]
        self.raw = raw

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx):
        name = self.names[idx]
        pos = np.loadtxt(osp.join(self.raw, f'{name}.xyz'),
                         dtype=np.float32)
        d = Data(pos=pos, num_nodes=pos.shape[0])
        npath = osp.join(self.raw, f'{name}.normals')
        if osp.exists(npath):
            d.norm = np.loadtxt(npath, dtype=np.float32)
        return d if self.transform is None else self.transform(d)


class ShapeNet(Dataset):
    """ShapeNet part segmentation (reference ``shapenet.py`` — txt
    clouds ``x y z nx ny nz part_label`` under category dirs)."""

    def __init__(self, root: str, categories=None, transform=None, **kw):
        self.root = root
        self.transform = transform
        raw = osp.join(root, 'raw')
        self.files, self.cats = [], []
        if osp.isdir(raw):
            for cat in sorted(os.listdir(raw)):
                cdir = osp.join(raw, cat)
                if not osp.isdir(cdir):
                    continue
                if categories and cat not in categories:
                    continue
                for f in sorted(os.listdir(cdir)):
                    if f.endswith('.txt'):
                        self.files.append(osp.join(cdir, f))
                        self.cats.append(cat)
        if not self.files:
            raise RuntimeError(f'ShapeNet: no category txts under {raw}')
        classes = sorted(set(self.cats))
        self.class_to_idx = {c: i for i, c in enumerate(classes)}

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        arr = np.loadtxt(self.files[idx], dtype=np.float32)
        d = Data(pos=arr[:, :3], num_nodes=arr.shape[0])
        if arr.shape[1] >= 6:
            d.norm = arr[:, 3:6]
        if arr.shape[1] >= 7:
            d.y = arr[:, 6].astype(np.int32)
        d.category = np.asarray([self.class_to_idx[self.cats[idx]]])
        return d if self.transform is None else self.transform(d)


class S3DIS(Dataset):
    """Indoor scene segmentation (reference ``s3dis.py`` — per-room
    npy blocks ``x y z r g b label``)."""

    def __init__(self, root: str, test_area: int = 6, train: bool = True,
                 transform=None, **kw):
        self.root = root
        self.transform = transform
        raw = osp.join(root, 'raw')
        self.files = []
        if osp.isdir(raw):
            for f in sorted(os.listdir(raw)):
                if not f.endswith('.npy'):
                    continue
                in_test = f'Area_{test_area}' in f
                if train != in_test:
                    self.files.append(osp.join(raw, f))
        if not self.files:
            raise RuntimeError(f'S3DIS: no room npys under {raw}')

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        arr = np.load(self.files[idx]).astype(np.float32)
        d = Data(pos=arr[:, :3], x=arr[:, 3:6] / 255.0,
                 y=arr[:, 6].astype(np.int32), num_nodes=arr.shape[0])
        return d if self.transform is None else self.transform(d)


class DynamicFAUST(Dataset):
    """4D human scans (reference ``dynamic_faust.py``; h5py-gated)."""

    def __init__(self, root: str, **kw):
        try:
            import h5py  # noqa
        except ImportError as e:  # pragma: no cover
            raise ImportError('DynamicFAUST requires h5py') from e
        raise RuntimeError('DynamicFAUST: place registrations_*.hdf5 '
                           f'under {osp.join(root, "raw")}')


class PascalPF(Dataset):
    """Pascal-PF keypoint pairs (reference ``pascal_pf.py`` — .mat
    keypoint annotations)."""

    def __init__(self, root: str, category: str, transform=None, **kw):
        from scipy.io import loadmat
        self.transform = transform
        raw = osp.join(root, 'raw', 'Annotations', category)
        if not osp.isdir(raw):
            raise RuntimeError(f'PascalPF: missing {raw}')
        self.graphs = []
        for f in sorted(os.listdir(raw)):
            if not f.endswith('.mat'):
                continue
            kps = loadmat(osp.join(raw, f))['kps'].astype(np.float32)
            kps = kps[~np.isnan(kps).any(-1)]
            self.graphs.append(Data(pos=kps, num_nodes=kps.shape[0]))

    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, idx):
        d = self.graphs[idx]
        return d if self.transform is None else self.transform(d)


class WILLOWObjectClass(PascalPF):
    """(reference ``willow.py`` — same keypoint .mat layout)."""

    def __init__(self, root: str, category: str, transform=None, **kw):
        from scipy.io import loadmat
        self.transform = transform
        raw = osp.join(root, 'raw', category)
        if not osp.isdir(raw):
            raise RuntimeError(f'WILLOW: missing {raw}')
        self.graphs = []
        for f in sorted(os.listdir(raw)):
            if not f.endswith('.mat'):
                continue
            pts = loadmat(osp.join(raw, f))['pts_coord'] \
                .astype(np.float32).T
            self.graphs.append(Data(pos=pts, num_nodes=pts.shape[0]))
