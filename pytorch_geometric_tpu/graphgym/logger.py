"""Per-split epoch stats logger (reference
``torch_geometric/graphgym/logger.py:35``)."""

import json
import os
import os.path as osp
import time
from typing import Dict, List, Optional


class Logger:
    def __init__(self, run_dir: str, split: str = 'train'):
        self.run_dir = osp.join(run_dir, split)
        os.makedirs(self.run_dir, exist_ok=True)
        self.split = split
        self.reset()
        self._epochs: List[Dict] = []

    def reset(self):
        self._loss = 0.0
        self._correct = 0
        self._count = 0
        self._start = time.perf_counter()

    def update_stats(self, true, pred, loss: float, batch_size: int):
        import numpy as np
        self._loss += float(loss) * batch_size
        self._count += batch_size
        if pred is not None and true is not None:
            self._correct += int((np.asarray(pred) ==
                                  np.asarray(true)).sum())

    def write_epoch(self, epoch: int) -> Dict:
        stats = {
            'epoch': epoch,
            'loss': self._loss / max(self._count, 1),
            'accuracy': self._correct / max(self._count, 1),
            'time': time.perf_counter() - self._start,
        }
        self._epochs.append(stats)
        with open(osp.join(self.run_dir, 'stats.json'), 'a') as f:
            f.write(json.dumps(stats) + '\n')
        self.reset()
        return stats
