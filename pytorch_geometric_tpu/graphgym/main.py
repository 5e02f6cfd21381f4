"""GraphGym CLI (reference ``graphgym/main.py``):
``python -m pytorch_geometric_tpu.graphgym.main --cfg cfg.yaml
[opts...]``."""

import argparse
import os
import os.path as osp

import jax

# The axon TPU plugin's sitecustomize overrides jax_platforms at
# interpreter start; re-apply the user's env choice so JAX_PLATFORMS
# behaves as documented.
if os.environ.get('JAX_PLATFORMS'):
    try:
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    except Exception:
        pass

from .config import load_cfg, set_cfg
from .train import train


def main():
    parser = argparse.ArgumentParser(description='GraphGym')
    parser.add_argument('--cfg', dest='cfg_file', type=str, default='',
                        help='Config file path (yaml/json)')
    parser.add_argument('--repeat', type=int, default=1,
                        help='Number of seeds to run')
    parser.add_argument('opts', nargs=argparse.REMAINDER,
                        help='Config overrides: key value ...')
    args = parser.parse_args()

    cfg = load_cfg(args.cfg_file, args.opts) if args.cfg_file \
        else set_cfg()
    if args.opts and not args.cfg_file:
        cfg.merge_from_list(args.opts)

    for i in range(args.repeat):
        run_cfg = cfg.clone()
        run_cfg.seed = cfg.seed + i
        run_dir = osp.join(cfg.out_dir, f'seed_{run_cfg.seed}')
        params, stats = train(run_cfg, run_dir=run_dir)
        row = {k: round(v.get('accuracy', 0.0), 4)
               for k, v in stats.items()}
        print(f'seed {run_cfg.seed}: {row}')


if __name__ == '__main__':
    main()
