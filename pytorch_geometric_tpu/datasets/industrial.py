"""Industrial-scale benchmark dataset parsers.

Reference files under ``torch_geometric/datasets/``: ``opf.py`` (OPF
grid scenarios), ``rcdd.py`` (Alibaba risk-commodity detection),
``graphland.py`` (GraphLand industrial node benchmarks),
``igmc_dataset.py`` (inductive matrix-completion rating graphs),
``tag_dataset.py`` (text-attributed-graph wrapper),
``protein_mpnn_dataset.py`` (PDB backbone chains). Each parser accepts
the reference's RAW dump layout under ``root/raw`` (zero-egress: no
downloads; ``download()`` raises with instructions) and emits our
numpy-backed ``Data``/``HeteroData``.
"""

import json
import os
import os.path as osp
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..data.data import Data
from ..data.dataset import Dataset
from ..data.hetero_data import HeteroData

__all__ = ['OPFDataset', 'RCDD', 'GraphLandDataset', 'IGMCDataset',
           'TAGDataset', 'ProteinMPNNDataset']


class _ListDataset(Dataset):
    """Process-on-init list dataset (graphs whose attrs — hetero
    stores, strings — don't fit the homogeneous npz collation)."""

    def __init__(self, root: str, transform=None, pre_transform=None,
                 pre_filter=None):
        self.root = root
        self.transform = transform
        self.pre_transform = pre_transform
        self.pre_filter = pre_filter
        os.makedirs(self.raw_dir, exist_ok=True)
        missing = [f for f in self.raw_file_names
                   if not osp.exists(osp.join(self.raw_dir, f))]
        if missing:
            raise FileNotFoundError(
                f'{type(self).__name__}: raw files {missing} not found '
                f'under {self.raw_dir} (zero-egress environment: '
                f'place them there manually)')
        self._data_list: List = []
        self.process()
        if self.pre_filter is not None:
            self._data_list = [d for d in self._data_list
                               if self.pre_filter(d)]
        if self.pre_transform is not None:
            self._data_list = [self.pre_transform(d)
                               for d in self._data_list]

    def len(self):
        return len(self._data_list)

    def get(self, idx):
        return self._data_list[idx]


# ---------------------------------------------------------------------------
# OPF
# ---------------------------------------------------------------------------


def _opf_edge_index(obj: dict, name: str, rev: bool = False) -> np.ndarray:
    e = obj['grid']['edges'][name]
    s, r = np.asarray(e['senders'], np.int64), np.asarray(
        e['receivers'], np.int64)
    return np.stack([r, s] if rev else [s, r])


class OPFDataset(_ListDataset):
    """AC optimal-power-flow scenarios (reference ``opf.py:33``): one
    HeteroData per grid snapshot with bus/generator/load/shunt nodes,
    ac_line/transformer bus-bus edges carrying features AND solution
    edge labels, and typed link edges; 90/5/5 split by scenario index.

    Raw layout: ``root/raw/group_<g>/<case>_<i>.json`` (the files the
    reference's tarballs extract to, ``opf.py:131-147``).
    """

    def __init__(self, root: str, split: str = 'train',
                 case_name: str = 'pglib_opf_case14_ieee',
                 num_groups: int = 20,
                 topological_perturbations: bool = False,
                 samples_per_group: int = 15_000, **kwargs):
        assert split in ('train', 'val', 'test')
        self.split = split
        self.case_name = case_name
        self.num_groups = num_groups
        self.topological_perturbations = topological_perturbations
        self.samples_per_group = samples_per_group
        self._release = 'dataset_release_1' + (
            '_nminusone' if topological_perturbations else '')
        super().__init__(root, **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'group_{i}' for i in range(self.num_groups)]

    def process(self):
        # split thresholds by scenario index (reference opf.py:207-215)
        train_lim = int(self.samples_per_group * self.num_groups * 0.9)
        val_lim = train_lim + int(
            self.samples_per_group * self.num_groups * 0.05)
        out = []
        for g in range(self.num_groups):
            gdir = osp.join(self.raw_dir, f'group_{g}')
            for name in sorted(os.listdir(gdir)):
                # group dirs may hold several cases/releases — only
                # this dataset's case (reference: one raw_dir per case)
                if not (name.endswith('.json')
                        and name.startswith(self.case_name + '_')):
                    continue
                with open(osp.join(gdir, name)) as f:
                    obj = json.load(f)
                i = int(name.split('.')[0].split('_')[-1])
                if self.split == 'train' and i >= train_lim:
                    continue
                if self.split == 'val' and not \
                        (train_lim <= i < val_lim):
                    continue
                if self.split == 'test' and i < val_lim:
                    continue
                grid, sol = obj['grid'], obj['solution']
                d = HeteroData()
                d.x = np.asarray(grid['context'],
                                 np.float32).reshape(-1)
                d.objective = np.asarray(obj['metadata']['objective'],
                                         np.float32)
                for nt in ('bus', 'generator', 'load', 'shunt'):
                    d[nt].x = np.asarray(grid['nodes'][nt], np.float32)
                for nt in ('bus', 'generator'):
                    d[nt].y = np.asarray(sol['nodes'][nt], np.float32)
                for rel in ('ac_line', 'transformer'):
                    st = d[('bus', rel, 'bus')]
                    st.edge_index = _opf_edge_index(obj, rel)
                    st.edge_attr = np.asarray(
                        grid['edges'][rel]['features'], np.float32)
                    st.edge_label = np.asarray(
                        sol['edges'][rel]['features'], np.float32)
                for src, rel in (('generator', 'generator_link'),
                                 ('load', 'load_link'),
                                 ('shunt', 'shunt_link')):
                    d[(src, rel, 'bus')].edge_index = \
                        _opf_edge_index(obj, rel)
                    d[('bus', rel, src)].edge_index = \
                        _opf_edge_index(obj, rel, rev=True)
                out.append(d)
        self._data_list = out

    def __repr__(self):
        return (f'{type(self).__name__}({len(self)}, '
                f'split={self.split}, case_name={self.case_name})')


# ---------------------------------------------------------------------------
# RCDD
# ---------------------------------------------------------------------------


class RCDD(_ListDataset):
    """Alibaba risk-commodity detection heterogeneous graph (reference
    ``rcdd.py:16``): 7 node / 7 edge types from the AliRCD_ICDM csv
    dumps; binary labels + train/test masks on the ``item`` type."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['AliRCD_ICDM_nodes.csv', 'AliRCD_ICDM_edges.csv',
                'AliRCD_ICDM_train_labels.csv',
                'AliRCD_ICDM_test_labels.csv']

    @property
    def num_classes(self) -> int:
        return 2

    def process(self):
        import pandas as pd
        raw = self.raw_dir
        d = HeteroData()
        node_df = pd.read_csv(
            osp.join(raw, 'AliRCD_ICDM_nodes.csv'), header=None,
            names=['node_id', 'node_type', 'node_feat'])
        # global -> per-type local ids (reference rcdd.py:84-96)
        mapping = np.empty(len(node_df), np.int64)
        for nt in node_df['node_type'].unique():
            mask = (node_df['node_type'] == nt).values
            ids = node_df['node_id'][mask].values
            mapping[ids] = np.arange(mask.sum())
            d[nt].num_nodes = int(mask.sum())
            d[nt].x = np.vstack([
                np.asarray(f.split(':'), np.float32)
                for f in node_df['node_feat'][mask]])
        edge_df = pd.read_csv(
            osp.join(raw, 'AliRCD_ICDM_edges.csv'), header=None,
            names=['src_id', 'dst_id', 'src_type', 'dst_type',
                   'edge_type'])
        for et in edge_df['edge_type'].unique():
            sub = edge_df[edge_df['edge_type'] == et]
            src_t = sub['src_type'].iloc[0]
            dst_t = sub['dst_type'].iloc[0]
            ei = np.stack([mapping[sub['src_id'].values],
                           mapping[sub['dst_id'].values]])
            d[(src_t, et, dst_t)].edge_index = ei
        train_df = pd.read_csv(
            osp.join(raw, 'AliRCD_ICDM_train_labels.csv'), header=None,
            names=['node_id', 'label'], dtype=int)
        test_df = pd.read_csv(
            osp.join(raw, 'AliRCD_ICDM_test_labels.csv'), header=None,
            sep='\t', names=['node_id', 'label'], dtype=int)
        n_item = d['item'].num_nodes
        y = np.full(n_item, -1, np.int64)
        train_idx = mapping[train_df['node_id'].values]
        test_idx = mapping[test_df['node_id'].values]
        y[train_idx] = train_df['label'].values
        y[test_idx] = test_df['label'].values
        tm = np.zeros(n_item, bool)
        tm[train_idx] = True
        sm = np.zeros(n_item, bool)
        sm[test_idx] = True
        d['item'].y = y
        d['item'].train_mask = tm
        d['item'].test_mask = sm
        self._data_list = [d]


# ---------------------------------------------------------------------------
# GraphLand
# ---------------------------------------------------------------------------


class GraphLandDataset(_ListDataset):
    """GraphLand industrial node benchmarks (reference
    ``graphland.py:25``): csv features (numerical / fraction /
    categorical) + yaml schema, RL/RH/TH transductive splits or the
    THI inductive three-snapshot setting; sklearn feature transforms
    fitted per the split's visibility rules."""

    GRAPHLAND_DATASETS = {
        'hm-categories': 'multiclass_classification',
        'pokec-regions': 'multiclass_classification',
        'web-topics': 'multiclass_classification',
        'tolokers-2': 'binary_classification',
        'city-reviews': 'binary_classification',
        'artnet-exp': 'binary_classification',
        'web-fraud': 'binary_classification',
        'hm-prices': 'regression',
        'avazu-ctr': 'regression',
        'city-roads-M': 'regression',
        'city-roads-L': 'regression',
        'twitch-views': 'regression',
        'artnet-views': 'regression',
        'web-traffic': 'regression',
    }

    def __init__(self, root: str, name: str, split: str,
                 numerical_features_transform: Optional[str] = 'default',
                 fraction_features_transform: Optional[str] = 'default',
                 categorical_features_transform: Optional[
                     str] = 'one_hot_encoding',
                 regression_targets_transform: Optional[str] = 'default',
                 to_undirected: bool = True, **kwargs):
        assert name in self.GRAPHLAND_DATASETS, \
            f'Unsupported dataset name: {name}'
        assert split in ('RL', 'RH', 'TH', 'THI'), \
            f'Unsupported split name: {split}'
        if numerical_features_transform == 'default':
            numerical_features_transform = 'quantile_transform_normal'
        if fraction_features_transform == 'default':
            fraction_features_transform = (
                'quantile_transform_normal'
                if name in ('artnet-views', 'avazu-ctr') else None)
        if regression_targets_transform == 'default':
            regression_targets_transform = 'standard_scaler'
        self.name = name
        self.split = split
        self.task = self.GRAPHLAND_DATASETS[name]
        self._num_transform = numerical_features_transform
        self._frac_transform = fraction_features_transform
        self._cat_transform = categorical_features_transform
        self._reg_transform = regression_targets_transform
        self._to_undirected = to_undirected
        super().__init__(root, **kwargs)

    @property
    def raw_dir(self) -> str:
        return osp.join(self.root, self.name, 'raw')

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [self.name]

    def _make_transform(self, kind: str):
        from sklearn.preprocessing import (MinMaxScaler, OneHotEncoder,
                                           QuantileTransformer,
                                           StandardScaler)
        return {
            'standard_scaler': lambda: StandardScaler(),
            'min_max_scaler': lambda: MinMaxScaler(clip=False),
            'quantile_transform_normal': lambda: QuantileTransformer(
                output_distribution='normal', subsample=None,
                random_state=0),
            'quantile_transform_uniform': lambda: QuantileTransformer(
                output_distribution='uniform', subsample=None,
                random_state=0),
            'one_hot_encoding': lambda: OneHotEncoder(
                drop='if_binary', sparse_output=False,
                handle_unknown='ignore', dtype=np.float32),
        }[kind]()

    def _raw(self) -> dict:
        import pandas as pd
        import yaml
        d = osp.join(self.raw_dir, self.name)
        with open(osp.join(d, 'info.yaml')) as f:
            info = yaml.safe_load(f)
        feats = pd.read_csv(osp.join(d, 'features.csv'), index_col=0)
        num_names = [n for n in info['numerical_features_names']
                     if n not in info['fraction_features_names']]
        targets = pd.read_csv(osp.join(d, 'targets.csv'), index_col=0)[
            info['target_name']].values.astype(np.float32)
        masks_df = pd.read_csv(
            osp.join(d, f'split_masks_{self.split[:2]}.csv'),
            index_col=0)
        masks = {k: np.asarray(v, bool)
                 for k, v in masks_df.to_dict('list').items()}
        edges = pd.read_csv(osp.join(d, 'edgelist.csv')).values
        return {
            'info': info,
            'num': feats[num_names].values.astype(np.float32),
            'cat': feats[info['categorical_features_names']]
            .values.astype(np.int32),
            'frac': feats[info['fraction_features_names']]
            .values.astype(np.float32),
            'targets': targets, 'masks': masks, 'edges': edges,
        }

    def _features(self, raw: dict, fit_mask: Optional[np.ndarray]):
        """Impute + transform the three feature families; transforms
        fit on ``fit_mask`` rows (inductive) or all rows
        (transductive, reference ``graphland.py:440-485``)."""
        from sklearn.impute import SimpleImputer
        parts = []
        widths = []
        for arr, kind in ((raw['num'], self._num_transform),
                          (raw['frac'], self._frac_transform)):
            if arr.size > 0:
                fit_rows = arr if fit_mask is None else arr[fit_mask]
                tf = (self._make_transform(kind)
                      if kind is not None else None)
                if tf is not None:
                    tf.fit(fit_rows)
                imp = SimpleImputer(missing_values=np.nan,
                                    strategy='most_frequent')
                imp.fit(fit_rows)
                arr = imp.transform(arr)
                if tf is not None:
                    arr = tf.transform(arr)
            parts.append(arr.astype(np.float32))
            widths.append(arr.shape[1])
        cat = raw['cat']
        if cat.size > 0 and self._cat_transform is not None:
            tf = self._make_transform(self._cat_transform)
            tf.fit(cat if fit_mask is None else cat[fit_mask])
            cat = tf.transform(cat)
        parts.append(cat.astype(np.float32))
        widths.append(cat.shape[1])
        x = np.concatenate(parts, axis=1)
        num_mask = np.zeros(x.shape[1], bool)
        num_mask[:widths[0]] = True
        frac_mask = np.zeros(x.shape[1], bool)
        frac_mask[widths[0]:widths[0] + widths[1]] = True
        cat_mask = np.zeros(x.shape[1], bool)
        if widths[2]:
            cat_mask[-widths[2]:] = True
        return x, num_mask, frac_mask, cat_mask

    def _targets(self, raw: dict, fit_mask: np.ndarray):
        targets = raw['targets']
        labeled = ~np.isnan(targets)
        if raw['info']['task'] == 'regression' and \
                self._reg_transform is not None:
            tf = self._make_transform(self._reg_transform)
            t2 = targets.reshape(-1, 1)
            tf.fit(t2[fit_mask])
            targets = tf.transform(t2).reshape(-1).astype(np.float32)
        return targets, labeled

    def _undirect(self, ei: np.ndarray) -> np.ndarray:
        both = np.concatenate([ei, ei[::-1]], axis=1)
        return np.unique(both, axis=1)

    def process(self):
        raw = self._raw()
        ei = raw['edges'].T.astype(np.int64)
        if self.split in ('RL', 'RH', 'TH'):
            targets, labeled = self._targets(raw, raw['masks']['train'])
            x, num_m, frac_m, cat_m = self._features(raw, None)
            if self._to_undirected:
                ei = self._undirect(ei)
            d = Data(
                edge_index=ei, x=x, y=targets,
                train_mask=raw['masks']['train'] & labeled,
                val_mask=raw['masks']['val'] & labeled,
                test_mask=raw['masks']['test'] & labeled,
                num_nodes=x.shape[0],
                x_numerical_mask=num_m, x_fraction_mask=frac_m,
                x_categorical_mask=cat_m)
            self._data_list = [d]
            return
        # THI: inductive three-snapshot setting (graphland.py:534+)
        fit = raw['masks']['train']
        targets, labeled = self._targets(raw, fit)
        x, num_m, frac_m, cat_m = self._features(raw, fit)
        out = []
        cum = np.zeros(len(targets), bool)
        for snap in ('train', 'val', 'test'):
            cum = cum | raw['masks'][snap]
            graph_mask = cum.copy()
            label_mask = raw['masks'][snap] & labeled
            node_id = np.nonzero(graph_mask)[0]
            relabel = -np.ones(len(targets), np.int64)
            relabel[node_id] = np.arange(len(node_id))
            keep = graph_mask[ei[0]] & graph_mask[ei[1]]
            sub_ei = relabel[ei[:, keep]]
            if self._to_undirected:
                sub_ei = self._undirect(sub_ei)
            out.append(Data(
                edge_index=sub_ei, x=x[graph_mask],
                y=targets[graph_mask], mask=label_mask[graph_mask],
                num_nodes=len(node_id),
                x_numerical_mask=num_m, x_fraction_mask=frac_m,
                x_categorical_mask=cat_m,
                cross_snapshot_node_id=node_id))
        self._data_list = out

    def __repr__(self):
        return f'{type(self).__name__}(name={self.name})'


# ---------------------------------------------------------------------------
# IGMC
# ---------------------------------------------------------------------------


class IGMCDataset(_ListDataset):
    """User-item rating graphs for inductive matrix completion
    (reference ``igmc_dataset.py:10``): Douban / Flixster /
    Yahoo-Music matlab v7.3 dumps (h5py), training ratings as typed
    edges, test ratings as edge labels."""

    def __init__(self, root: str, name: str, **kwargs):
        self.name = name.lower().replace('-', '_')
        assert self.name in ('flixster', 'douban', 'yahoo_music')
        super().__init__(root, **kwargs)

    @property
    def raw_dir(self) -> str:
        return osp.join(self.root, self.name, 'raw')

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['training_test_dataset.mat']

    @staticmethod
    def load_matlab_file(path: str, name: str) -> np.ndarray:
        import h5py
        with h5py.File(path, 'r') as db:
            obj = db[name]
            if isinstance(obj, h5py.Group):
                # MATLAB v7.3 sparse matrix: CSC data/ir/jc triplets
                import scipy.sparse as sp
                data = np.asarray(obj['data'], np.float64).ravel()
                ir = np.asarray(obj['ir'], np.int64).ravel()
                jc = np.asarray(obj['jc'], np.int64).ravel()
                shape = tuple(int(v) for v in
                              obj.attrs['MATLAB_sparse_shape']) \
                    if 'MATLAB_sparse_shape' in obj.attrs else None
                ncols = len(jc) - 1
                nrows = (int(ir.max()) + 1 if len(ir) else 0) \
                    if shape is None else shape[0]
                mat = sp.csc_matrix((data, ir, jc),
                                    shape=(nrows, ncols))
                # v7.3 stores column-major: csc over (rows, cols)
                # already matches the logical orientation
                return np.asarray(mat.todense(), np.float32)
            return np.asarray(obj, np.float32).T

    def process(self):
        path = osp.join(self.raw_dir, 'training_test_dataset.mat')
        M = self.load_matlab_file(path, 'M')
        if self.name == 'flixster':
            user_x = self.load_matlab_file(path, 'W_users')
            item_x = self.load_matlab_file(path, 'W_movies')
        elif self.name == 'douban':
            user_x = self.load_matlab_file(path, 'W_users')
            item_x = np.eye(M.shape[1], dtype=np.float32)
        else:
            user_x = np.eye(M.shape[0], dtype=np.float32)
            item_x = self.load_matlab_file(path, 'W_tracks')
        d = HeteroData()
        d['user'].x = user_x
        d['item'].x = item_x
        train = self.load_matlab_file(path, 'Otraining').astype(bool)
        r, c = np.nonzero(train)
        ei = np.stack([r, c]).astype(np.int64)
        rating = M[r, c]
        d[('user', 'rates', 'item')].edge_index = ei
        d[('user', 'rates', 'item')].rating = rating
        d[('item', 'rated_by', 'user')].edge_index = ei[::-1].copy()
        d[('item', 'rated_by', 'user')].rating = rating
        test = self.load_matlab_file(path, 'Otest').astype(bool)
        r, c = np.nonzero(test)
        d[('user', 'rates', 'item')].edge_label_index = \
            np.stack([r, c]).astype(np.int64)
        d[('user', 'rates', 'item')].edge_label = M[r, c]
        self._data_list = [d]

    def __repr__(self):
        return f'{type(self).__name__}(name={self.name})'


# ---------------------------------------------------------------------------
# TAG
# ---------------------------------------------------------------------------


class TAGDataset:
    """Text-attributed-graph wrapper (reference ``tag_dataset.py:48``):
    attaches per-node raw text (+ optional LLM predictions /
    explanations) to an existing dataset, tokenizes for LM training,
    and exposes gold-label bookkeeping for the GLEM-style LM/GNN loop.

    Args:
        root: directory for token caches.
        dataset: the wrapped graph dataset (``dataset[0]`` is the graph).
        tokenizer_name: HF tokenizer id, or pass ``tokenizer=`` directly
            (zero-egress: an in-memory tokenizer with
            ``__call__(texts, ...) -> {'input_ids', 'attention_mask'}``).
        text: per-node raw text, aligned with node ids.
    """

    def __init__(self, root: str, dataset, tokenizer_name: str = '',
                 text: Optional[List[str]] = None,
                 split_idx: Optional[Dict[str, np.ndarray]] = None,
                 llm_predictions: Optional[np.ndarray] = None,
                 llm_explanation: Optional[List[str]] = None,
                 tokenize_batch_size: int = 256,
                 token_on_disk: bool = False, tokenizer=None):
        self.root = root
        self.dataset = dataset
        self.name = getattr(dataset, 'name', type(dataset).__name__)
        self.text = text
        self.llm_explanation = llm_explanation
        self.llm_prediction_topk = 5
        self.tokenizer_name = tokenizer_name
        if tokenizer is None:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(tokenizer_name)
        self.tokenizer = tokenizer
        self.tokenize_batch_size = tokenize_batch_size
        self.token_on_disk = token_on_disk
        os.makedirs(root, exist_ok=True)

        data = dataset[0]
        self._data = data
        n = int(data.num_nodes)
        if text is not None and len(text) != n:
            raise ValueError(f'The size of text list ({len(text)}) '
                             f'does not match number of nodes ({n})')
        if split_idx is None:
            split_idx = {}
            for split in ('train', 'val', 'test'):
                m = getattr(data, f'{split}_mask', None)
                if m is not None:
                    split_idx[split] = np.nonzero(np.asarray(m))[0]
        self._split_idx = split_idx
        # gold = nodes whose label is ground truth (train split);
        # others may carry LLM pseudo-labels (reference :227-249)
        self._is_gold = np.zeros(n, bool)
        if 'train' in split_idx:
            self._is_gold[split_idx['train']] = True
        self.llm_predictions = llm_predictions

    # -- reference API ------------------------------------------------------
    @property
    def num_classes(self) -> int:
        return int(np.asarray(self._data.y).max()) + 1

    @property
    def is_gold(self) -> np.ndarray:
        return self._is_gold

    def get_n_id(self, node_idx) -> np.ndarray:
        return np.asarray(node_idx)

    def get_gold(self, node_idx) -> np.ndarray:
        return self._is_gold[np.asarray(node_idx)]

    def get_idx_split(self) -> Dict[str, np.ndarray]:
        return self._split_idx

    def pseudo_labels(self) -> Optional[np.ndarray]:
        """Top-1 LLM predictions as pseudo-labels for non-gold nodes
        (reference ``tag_dataset.py:270-323`` merges TAPE gpt_preds)."""
        if self.llm_predictions is None:
            return None
        preds = np.asarray(self.llm_predictions)
        top1 = preds[:, 0] if preds.ndim == 2 else preds
        y = np.asarray(self._data.y).copy()
        y[~self._is_gold] = top1[~self._is_gold]
        return y

    def tokenize_graph(self, batch_size: Optional[int] = None,
                       text_type: str = 'raw_text'
                       ) -> Dict[str, np.ndarray]:
        """Tokenize every node's text (reference ``:335-407``); cached
        on disk under ``root/token/<text_type>`` when
        ``token_on_disk``."""
        assert text_type in ('raw_text', 'llm_explanation', 'all')
        if text_type == 'raw_text':
            texts = self.text
        elif text_type == 'llm_explanation':
            texts = self.llm_explanation
        else:
            if self.text is None or self.llm_explanation is None:
                raise ValueError('need text and llm_explanation '
                                 'for tokenizing all text')
            texts = [f'{t} Explanation: {e}'
                     for t, e in zip(self.text, self.llm_explanation)]
        if texts is None:
            raise ValueError('The TAGDataset needs text for '
                             'tokenization')
        cache = osp.join(self.root, 'token', text_type)
        if self.token_on_disk and osp.exists(
                osp.join(cache, 'input_ids.npy')):
            return {f[:-4]: np.load(osp.join(cache, f))
                    for f in os.listdir(cache) if f.endswith('.npy')}
        bs = batch_size or self.tokenize_batch_size
        out: Dict[str, List] = {}
        for i in range(0, len(texts), bs):
            tok = self.tokenizer(list(texts[i:i + bs]),
                                 padding='max_length', truncation=True,
                                 max_length=512)
            for k, v in dict(tok).items():
                out.setdefault(k, []).append(np.asarray(v))
        result = {k: np.concatenate(v) for k, v in out.items() if v}
        if self.token_on_disk:
            os.makedirs(cache, exist_ok=True)
            for k, v in result.items():
                np.save(osp.join(cache, f'{k}.npy'), v)
        return result

    class TextDataset:
        """Token view for LM training (reference ``:411-477``)."""

        def __init__(self, tag, text_type: str = 'raw_text'):
            self.tag = tag
            self.token = tag.tokenize_graph(text_type=text_type)
            self.labels = np.asarray(tag._data.y)

        def __len__(self):
            return len(self.labels)

        def __getitem__(self, idx):
            item = {k: v[idx] for k, v in self.token.items()}
            item['labels'] = self.labels[idx]
            item['is_gold'] = self.tag._is_gold[idx]
            return item

    def to_text_dataset(self, text_type: str = 'raw_text'):
        return TAGDataset.TextDataset(self, text_type)

    def __getitem__(self, idx):
        return self.dataset[idx]

    def __len__(self):
        return len(self.dataset)

    def __repr__(self):
        return f'{type(self).__name__}({self.name})'


# ---------------------------------------------------------------------------
# ProteinMPNN
# ---------------------------------------------------------------------------

_MPNN_ALPHABET = 'ACDEFGHIKLMNPQRSTVWYX'


class ProteinMPNNDataset(_ListDataset):
    """PDB backbone-chain dataset for ProteinMPNN training (reference
    ``protein_mpnn_dataset.py:19``): ``list.csv`` chain metadata with
    resolution/date cuts, cluster-based train/valid/test splits, and
    per-chain ``.pt`` coordinate dumps assembled into
    ``Data(x=[L, 4, 3], chain_seq_label, mask, chain_mask_all,
    residue_idx, chain_encoding_all)``."""

    def __init__(self, root: str, split: str = 'train',
                 datacut: str = '2030-01-01', rescut: float = 3.5,
                 homo: float = 0.70, max_length: int = 10_000,
                 num_units: int = 150, seed: int = 0, **kwargs):
        assert split in ('train', 'valid', 'test')
        self.split = split
        self.datacut = datacut
        self.rescut = rescut
        self.homo = homo
        self.max_length = max_length
        self.num_units = num_units
        self.rng = np.random.default_rng(seed)
        super().__init__(root, **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['list.csv', 'valid_clusters.txt', 'test_clusters.txt']

    def _split_clusters(self) -> Dict:
        """Cluster -> chain list for this split (reference
        ``_process_split``, ``protein_mpnn_dataset.py:178``)."""
        import pandas as pd
        df = pd.read_csv(osp.join(self.raw_dir, 'list.csv'))
        df = df[(df['RESOLUTION'] <= self.rescut)
                & (df['DEPOSITION'] <= self.datacut)]
        val_ids = set(np.loadtxt(
            osp.join(self.raw_dir, 'valid_clusters.txt'),
            dtype=np.int64, ndmin=1).tolist())
        test_ids = set(np.loadtxt(
            osp.join(self.raw_dir, 'test_clusters.txt'),
            dtype=np.int64, ndmin=1).tolist())
        out: Dict[str, Dict] = {'train': {}, 'valid': {}, 'test': {}}
        for _, r in df.iterrows():
            cid = r['CLUSTER']
            key = ('valid' if cid in val_ids else
                   'test' if cid in test_ids else 'train')
            out[key].setdefault(cid, []).append(
                (r['CHAINID'], r['HASH']))
        return out[self.split]

    def _load_chain(self, chain_id: str) -> Optional[dict]:
        """Single-chain load (the no-assembly path of
        ``_process_pdb1``, reference ``:221-250``); chains are torch
        ``.pt`` dumps with ``seq`` and ``xyz [L, >=4, 3]``."""
        import torch
        pdbid, chid = chain_id.split('_')
        prefix = osp.join(self.raw_dir, 'pdb', pdbid[1:3], pdbid)
        path = f'{prefix}_{chid}.pt'
        if not osp.isfile(path):
            return None
        chain = torch.load(path, weights_only=False)
        xyz = np.asarray(chain['xyz'], np.float32)
        return {'seq': chain['seq'], 'xyz': xyz,
                'idx': np.zeros(len(chain['seq']), np.int64),
                'masked': np.asarray([0], np.int64),
                'label': chain_id}

    def _to_data(self, t: dict) -> Optional[Data]:
        """Chains -> training tensors (``_process_pdb2/3``, reference
        ``:317-451``): per-chain N/CA/C/O backbone stack, mask from
        finite coords, residue index with +100 jumps across chains."""
        seq = t['seq']
        if len(seq) > self.max_length or \
                set(seq) - set(_MPNN_ALPHABET):
            return None
        chains = []
        for idx in np.unique(t['idx']):
            res = np.nonzero(t['idx'] == idx)[0]
            if len(res) < 4:
                continue
            chain_seq = ''.join(np.array(list(seq))[res])
            xyz = t['xyz'][res][:, :4, :]        # N, CA, C, O
            chains.append((chain_seq, xyz, idx in t['masked']))
        if not chains:
            return None
        order = self.rng.permutation(len(chains))
        x_all, label_all, cmask_all, enc_all, ridx_all = \
            [], [], [], [], []
        l0 = 0
        for c, k in enumerate(order, start=1):
            chain_seq, xyz, masked = chains[k]
            ln = len(chain_seq)
            x_all.append(xyz)
            label_all.append([_MPNN_ALPHABET.index(a)
                              for a in chain_seq])
            cmask_all.append(np.full(ln, 1.0 if masked else 0.0,
                                     np.float32))
            enc_all.append(np.full(ln, c, np.int64))
            ridx_all.append(100 * (c - 1) + np.arange(l0, l0 + ln))
            l0 += ln
        x = np.concatenate(x_all, 0).astype(np.float32)
        mask = np.isfinite(x.sum((1, 2))).astype(np.float32)
        x = np.nan_to_num(x, nan=0.0)
        return Data(
            x=x,
            chain_seq_label=np.concatenate(label_all).astype(np.int64),
            mask=mask,
            chain_mask_all=np.concatenate(cmask_all),
            residue_idx=np.concatenate(ridx_all).astype(np.int64),
            chain_encoding_all=np.concatenate(enc_all),
            num_nodes=x.shape[0])

    def process(self):
        out = []
        for _, items in self._split_clusters().items():
            for chain_id, _ in items:
                item = self._load_chain(chain_id)
                if item is None or 'label' not in item:
                    continue
                d = self._to_data(item)
                if d is not None:
                    out.append(d)
                if len(out) >= self.num_units:
                    break
            if len(out) >= self.num_units:
                break
        self._data_list = out

    def __repr__(self):
        return f'{type(self).__name__}({len(self)}, split={self.split})'
