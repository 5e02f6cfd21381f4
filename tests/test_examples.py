"""Examples stay runnable (guards the examples/ tree against rot).

Runs a fast subset end-to-end as subprocesses; the full matrix is
exercised manually (`examples/README.md`).
"""
import os
import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.parametrize('name', ['gcn', 'label_prop',
                                  'graphgym_grid_search',
                                  'rag_retrieval', 'graphgym_trainer'])
def test_example_runs(name):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    # Drop the axon TPU plugin's sitecustomize dir from the child's
    # PYTHONPATH: it overrides JAX_PLATFORMS to 'axon,cpu', and a wedged
    # tunnel then hangs the example subprocess for minutes.
    inherited = [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
                 if p and 'axon' not in p]
    env['PYTHONPATH'] = os.pathsep.join([REPO] + inherited)
    out = subprocess.run(
        [sys.executable, osp.join(REPO, 'examples', f'{name}.py')],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert ('acc' in out.stdout or 'grid points' in out.stdout
            or 'retrieved: True' in out.stdout)
