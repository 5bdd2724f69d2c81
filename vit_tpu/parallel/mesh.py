"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axes: Dict[str, int], devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build a Mesh with named axes, e.g. ``make_mesh({'dp': 4, 'tp': 2})``.

    Axis order follows dict order; sizes must multiply to the device count.
    ICI topology note: put the axis with the heaviest collectives (tp) last so
    it maps to nearest-neighbor links.
    """
    if devices is None:
        devices = jax.devices()
    names = tuple(axes)
    shape = tuple(axes[n] for n in names)
    n = int(np.prod(shape)) if shape else 1
    if n != len(devices):
        raise ValueError(
            f"mesh {dict(axes)} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def mesh_shape_for(
    n_devices: int, tp: int = 1, dp: Optional[int] = None
) -> Dict[str, int]:
    """Pick a {'dp', 'tp'} factorization of ``n_devices``."""
    if n_devices % tp:
        raise ValueError(f"tp={tp} does not divide {n_devices} devices")
    if dp is None:
        dp = n_devices // tp
    if dp < 1 or tp < 1:
        # 0 % tp == 0 and 0*tp == 0, so without this gate tp > n_devices
        # builds an empty {'dp': 0} mesh that fails much later with an
        # inscrutable sharding error
        raise ValueError(
            f"dp={dp}, tp={tp} over {n_devices} device(s): every mesh "
            "axis needs >= 1 (is --tp larger than the device count?)"
        )
    if dp * tp != n_devices:
        raise ValueError(f"dp*tp = {dp * tp} != {n_devices}")
    return {"dp": dp, "tp": tp}
