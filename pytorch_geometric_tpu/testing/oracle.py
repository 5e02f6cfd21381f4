"""Weight-transplant helper for reference-oracle parity tests.

Maps a torch reference module's ``state_dict()`` onto a flax params
pytree by name: flax path ``('lin_src', 'kernel')`` pulls
``lin_src.weight`` (transposed), ``('lin_src', 'bias')`` pulls
``lin_src.bias``, any other leaf pulls the same dotted name verbatim.
Per-test ``overrides`` (flax dotted path -> numpy array) win over the
automatic mapping. Import of torch happens lazily so the module stays
importable without the reference installed.
"""

from typing import Callable, Dict, Optional, Union

import numpy as np

__all__ = ['transplant']


def transplant(ref_module, params,
               overrides: Optional[Dict[str, Union[np.ndarray,
                                                   Callable]]] = None):
    """Return ``params`` with every leaf replaced by the reference
    module's matching weight. Raises KeyError/AssertionError with the
    offending path so mismatches are actionable."""
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_module.state_dict().items()}
    overrides = overrides or {}
    if 'params' not in params:        # parameter-free module
        return params
    flat = flatten_dict(params['params'])
    out = {}
    for path, leaf in flat.items():
        key = '.'.join(str(p) for p in path)
        if key in overrides:
            t = overrides[key]
            if callable(t):
                t = t(sd)
        elif path[-1] == 'kernel':
            name = '.'.join(str(p) for p in path[:-1]) + '.weight'
            if name not in sd:
                raise KeyError(
                    f"no reference weight for flax '{key}': tried "
                    f"'{name}'; available: {sorted(sd)}")
            t = sd[name].T
        elif path[-1] == 'bias' and len(path) > 1:
            name = '.'.join(str(p) for p in path[:-1]) + '.bias'
            if name not in sd:
                raise KeyError(
                    f"no reference bias for flax '{key}': tried "
                    f"'{name}'; available: {sorted(sd)}")
            t = sd[name]
        else:
            if key not in sd:
                raise KeyError(
                    f"no reference param for flax '{key}'; "
                    f"available: {sorted(sd)}")
            t = sd[key]
        t = np.asarray(t)
        assert t.shape == leaf.shape, (
            f"shape mismatch at '{key}': reference {t.shape} vs "
            f"ours {leaf.shape}")
        out[path] = jnp.asarray(t.astype(np.asarray(leaf).dtype))
    # preserve non-param collections (e.g. flax batch_stats)
    rest = {k: v for k, v in params.items() if k != 'params'}
    return {'params': unflatten_dict(out), **rest}
