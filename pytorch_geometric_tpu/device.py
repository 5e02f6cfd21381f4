"""Device helpers (reference ``torch_geometric/device.py``).

TPU-native reading: the accelerator roster is JAX's, so ``device()``
returns a :class:`jax.Device`. The torch-ecosystem availability probes
(`mps`/`xpu`) are kept for API parity — they consult torch if it is
importable and report ``False`` otherwise, mirroring the reference's
optional-backend behavior.
"""

from typing import Any, Union

import jax


def is_mps_available() -> bool:
    """Whether torch's Apple-Metal backend is usable (parity probe)."""
    try:
        import torch
        if torch.backends.mps.is_available():
            # The reference additionally checks that a tensor can
            # actually be placed on the device.
            torch.empty(1, device='mps')
            return True
    except Exception:
        pass
    return False


def is_xpu_available() -> bool:
    """Whether torch's Intel-XPU backend is usable (parity probe)."""
    try:
        import torch
        return bool(torch.xpu.is_available())
    except Exception:
        return False


def device(device: Any = 'auto') -> Union[jax.Device, Any]:
    """Resolves a device spec to a concrete :class:`jax.Device`.

    ``'auto'`` picks the first accelerator (TPU if the backend is up,
    otherwise CPU) — the analog of the reference's cuda>mps>xpu>cpu
    ladder. A platform string (``'tpu'``/``'cpu'``) selects the first
    device of that platform; a :class:`jax.Device` passes through.
    """
    if isinstance(device, jax.Device):
        return device
    if device in (None, 'auto'):
        return jax.devices()[0]
    try:
        return jax.devices(str(device))[0]
    except RuntimeError as e:
        raise ValueError(f"Could not resolve device {device!r}: {e}")
