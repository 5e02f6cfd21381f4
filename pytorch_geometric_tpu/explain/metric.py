"""Explanation metrics (reference ``torch_geometric/explain/metric/``:
``basic.py`` groundtruth_metrics, ``fidelity.py``,
``faithfulness.py``)."""

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def groundtruth_metrics(pred_mask, target_mask, threshold: float = 0.5,
                        metrics: Sequence[str] = ('accuracy', 'recall',
                                                  'precision', 'f1_score',
                                                  'auroc')):
    """(reference ``explain/metric/basic.py``)."""
    p = np.asarray(pred_mask).reshape(-1)
    t = np.asarray(target_mask).reshape(-1).astype(bool)
    ph = p >= threshold
    tp = (ph & t).sum()
    fp = (ph & ~t).sum()
    fn = (~ph & t).sum()
    tn = (~ph & ~t).sum()
    out = []
    for m in metrics:
        if m == 'accuracy':
            out.append((tp + tn) / max(len(p), 1))
        elif m == 'recall':
            out.append(tp / max(tp + fn, 1))
        elif m == 'precision':
            out.append(tp / max(tp + fp, 1))
        elif m == 'f1_score':
            prec = tp / max(tp + fp, 1)
            rec = tp / max(tp + fn, 1)
            out.append(2 * prec * rec / max(prec + rec, 1e-12))
        elif m == 'auroc':
            order = np.argsort(-p)
            ts = t[order]
            cum_tp = np.cumsum(ts)
            cum_fp = np.cumsum(~ts)
            tpr = cum_tp / max(t.sum(), 1)
            fpr = cum_fp / max((~t).sum(), 1)
            out.append(float(np.trapezoid(tpr, fpr)))
        else:
            raise ValueError(f"Unknown metric '{m}'")
    return out


def fidelity(model_fn, explanation) -> Tuple[float, float]:
    """(fid+, fid-) (reference ``explain/metric/fidelity.py``):
    prediction change when removing the explanation (fid+) vs keeping
    only the explanation (fid-)."""
    x = explanation.x
    em = explanation.edge_mask
    target = np.asarray(explanation.target).reshape(-1)

    def acc(edge_weight):
        logits = model_fn(x, edge_weight)
        pred = np.asarray(logits.argmax(-1)).reshape(-1)
        return (pred[:len(target)] == target).mean()

    full = acc(None)
    keep = acc(em)                       # only explanation
    remove = acc(1.0 - np.asarray(em))   # without explanation
    return float(full - remove), float(full - keep)


def characterization_score(fid_pos: float, fid_neg: float,
                           pos_weight: float = 0.5,
                           neg_weight: float = 0.5) -> float:
    """(reference ``fidelity.py:characterization_score``)."""
    denom = (pos_weight / max(fid_pos, 1e-12)
             + neg_weight / max(1 - fid_neg, 1e-12))
    return (pos_weight + neg_weight) / denom


def unfaithfulness(model_fn, explanation) -> float:
    """1 - exp(-KL(full || masked)) (reference ``faithfulness.py``)."""
    import jax
    x = explanation.x
    y_full = jax.nn.softmax(model_fn(x, None), -1)
    xm = x * explanation.node_mask if explanation.node_mask is not None \
        else x
    y_mask = jax.nn.softmax(model_fn(xm, explanation.edge_mask), -1)
    kl = (y_full * (jnp.log(y_full + 1e-15)
                    - jnp.log(y_mask + 1e-15))).sum(-1).mean()
    return float(1 - jnp.exp(-kl))
