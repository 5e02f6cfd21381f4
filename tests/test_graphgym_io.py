"""GraphGym-lite, io, visualization tests."""
import os.path as osp

import jax
import numpy as np
import pytest

from pytorch_geometric_tpu.graphgym import (cfg, set_cfg, load_cfg,
                                            register, registry,
                                            create_model, train,
                                            save_ckpt, load_ckpt,
                                            clean_ckpt)
from pytorch_geometric_tpu.io import (read_off, write_off, read_obj,
                                      read_txt_array)
from pytorch_geometric_tpu.visualization import visualize_graph, influence


def test_cfg_merge():
    c = set_cfg()
    assert c.gnn.dim_inner == 64
    c.merge_from_list(['gnn.dim_inner', '32', 'optim.base_lr', '0.1'])
    assert c.gnn.dim_inner == 32 and c.optim.base_lr == 0.1
    c2 = c.clone()
    c2.gnn.dim_inner = 8
    assert c.gnn.dim_inner == 32


def test_register():
    @register('layer', 'mylayer')
    class Dummy:
        pass

    assert registry['layer']['mylayer'] is Dummy


def test_train_with_resume(tmp_path):
    c = set_cfg()
    c.out_dir = str(tmp_path)
    c.optim.max_epoch = 4
    c.train.ckpt_period = 2
    c.dataset.avg_num_nodes = 80
    c.gnn.dim_inner = 16
    run_dir = str(tmp_path / 'run')
    params, stats = train(c, run_dir=run_dir)
    assert 'train' in stats and stats['train']['accuracy'] > 0.3
    ck = load_ckpt(run_dir)
    assert ck is not None and ck['epoch'] == 3
    # resume: runs remaining epochs (none) without error
    c.optim.max_epoch = 6
    params, stats = train(c, run_dir=run_dir)
    ck = load_ckpt(run_dir)
    assert ck['epoch'] == 5
    clean_ckpt(run_dir, keep_last=1)
    import glob
    assert len(glob.glob(osp.join(run_dir, 'ckpt', '*.pkl'))) == 1


@pytest.mark.parametrize('layer', ['gcnconv', 'sageconv', 'ginconv'])
def test_model_builder_layers(layer):
    import jax.numpy as jnp
    c = set_cfg()
    c.gnn.layer_type = layer
    c.gnn.layers_mp = 2
    c.gnn.dim_inner = 8
    model = create_model(c)
    x = jnp.ones((6, 4))
    coo = jnp.asarray(np.array([[0, 1, 2], [1, 2, 3]], np.int32))
    params = model.init(jax.random.PRNGKey(0), x, coo)
    out = model.apply(params, x, coo)
    assert out.shape == (6, c.dataset.num_classes)


def test_off_roundtrip(tmp_path):
    from pytorch_geometric_tpu.data import Data
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    face = np.array([[0, 1, 2]], np.int64).T
    p = str(tmp_path / 'm.off')
    write_off(Data(pos=pos, face=face, num_nodes=3), p)
    data = read_off(p)
    np.testing.assert_allclose(np.asarray(data.pos), pos)
    np.testing.assert_array_equal(np.asarray(data.face), face)


def test_obj_and_txt(tmp_path):
    p = str(tmp_path / 'm.obj')
    open(p, 'w').write('v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n')
    data = read_obj(p)
    assert data.num_nodes == 3 and data.face.shape == (3, 1)
    p = str(tmp_path / 'a.txt')
    open(p, 'w').write('1 2\n3 4\n')
    arr = read_txt_array(p)
    np.testing.assert_allclose(arr, [[1, 2], [3, 4]])


def test_visualization(tmp_path):
    coo = np.array([[0, 1, 2], [1, 2, 0]], np.int32)
    g = visualize_graph(coo, backend='networkx')
    assert g.number_of_edges() == 3
    inf = influence(np.ones((4, 3)))
    np.testing.assert_allclose(inf.sum(), 1.0)
