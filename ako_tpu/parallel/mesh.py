"""Device-mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("tiles",),
    devices=None,
) -> Mesh:
    """1-D (default) or N-D mesh over the available devices.

    The codec's primary axis is "tiles" (independent-tile data
    parallelism); halo-sharded single-tile mode uses a "rows" axis.
    """
    devices = jax.devices() if devices is None else devices
    if shape is None:
        shape = (len(devices),)
    devs = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, axis_names=tuple(axis_names))
