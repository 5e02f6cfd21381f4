"""Lightweight experiment logging (reference
``torch_geometric/logging.py:7`` — init_wandb / log)."""

from typing import Any

_use_wandb = False


def init_wandb(name: str, **kwargs):
    """Start a wandb run if wandb is importable; silently no-ops
    otherwise (matching the reference's opt-in behavior)."""
    global _use_wandb
    try:
        import wandb
    except ImportError:
        _use_wandb = False
        return
    wandb.init(name=name, config=kwargs)
    _use_wandb = True


def log(**kwargs: Any):
    """Print + forward to wandb when active (reference ``log``)."""
    def fmt(v):
        try:
            return f'{float(v):.4f}'
        except (TypeError, ValueError):
            return str(v)
    print(', '.join(f'{k}: {fmt(v)}' for k, v in kwargs.items()))
    if _use_wandb:
        import wandb
        wandb.log(kwargs)
