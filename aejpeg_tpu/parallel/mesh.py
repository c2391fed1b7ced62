"""Device mesh helpers.

The codec's scaling axes (BASELINE.json north star): the image batch shards
over 'data' (hosts/DCN), per-bucket block batches shard over 'block'
(chips/ICI).  There is no parameter state, so this is the codec's analogue
of dp x tp.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Sequence[str] = ("data", "block"),
              devices=None) -> Mesh:
    """Create a (data, block) mesh over the available devices.

    Default shape: all devices on 'data' if <= 4, else a 2-row 'block'
    split to exercise both axes.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1) if n <= 4 else (n // 2, 2)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
