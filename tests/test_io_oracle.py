"""io-parser parity vs the reference oracle: OFF (incl. the fused
"OFF4 4 0" header variant), OBJ, SDF, txt_array. PLY is skipped — the
reference delegates it to openmesh (absent here)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
import torch_geometric.io as RIO

import pytorch_geometric_tpu.io as IO

OFF_SRC = """OFF
4 2 0
0.0 0.0 0.0
1.0 0.0 0.0
0.0 1.0 0.0
1.0 1.0 0.0
3 0 1 2
3 1 3 2
"""

OFF_FUSED = OFF_SRC.replace("OFF\n4 2 0", "OFF4 2 0")

OBJ_SRC = """# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.0
v 1.0 1.0 0.0
f 1 2 3
f 2 4 3
"""

SDF_SRC = """ mol
 prog
 comment
  4  3  0  0  0  0
    0.0000    0.0000    0.0000 C
    1.2000    0.0000    0.0000 O
   -1.2000    0.0000    0.0000 H
    0.0000    1.2000    0.0000 N
  1  2  2
  1  3  1
  1  4  1
M  END
"""


def _cmp(ours, ref, fields=('pos', 'face')):
    for f in fields:
        o, r = getattr(ours, f, None), getattr(ref, f, None)
        assert (o is None) == (r is None), f
        if o is not None:
            np.testing.assert_allclose(np.asarray(o), r.numpy(),
                                       rtol=1e-6, atol=1e-6, err_msg=f)


@pytest.mark.parametrize('src', [OFF_SRC, OFF_FUSED])
def test_read_off(tmp_path, src):
    p = tmp_path / 'm.off'
    p.write_text(src)
    _cmp(IO.read_off(str(p)), RIO.read_off(str(p)))


def test_write_off_roundtrip(tmp_path):
    p = tmp_path / 'm.off'
    p.write_text(OFF_SRC)
    ours = IO.read_off(str(p))
    q = tmp_path / 'o.off'
    IO.write_off(ours, str(q))
    again = RIO.read_off(str(q))
    _cmp(ours, again)


def test_read_obj(tmp_path):
    p = tmp_path / 'm.obj'
    p.write_text(OBJ_SRC)
    _cmp(IO.read_obj(str(p)), RIO.read_obj(str(p)))


def test_parse_sdf():
    ours = IO.parse_sdf(SDF_SRC)
    ref = RIO.parse_sdf(SDF_SRC)
    np.testing.assert_allclose(np.asarray(ours.pos), ref.pos.numpy(),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.x), ref.x.numpy())
    # reference stores undirected coalesced bonds with one-hot types
    np.testing.assert_array_equal(np.asarray(ours.edge_index),
                                  ref.edge_index.numpy())
    np.testing.assert_array_equal(np.asarray(ours.edge_attr),
                                  ref.edge_attr.numpy())


def test_txt_array():
    src = "1.0 2.0 3.0\n4.0 5.0 6.0"
    ours = IO.parse_txt_array(src.split('\n'))
    ref = RIO.parse_txt_array(src.split('\n'))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy())
