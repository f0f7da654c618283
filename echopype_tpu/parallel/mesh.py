"""Device mesh construction for sharded survey processing.

The workload's parallel axes (SURVEY.md §2.6): ping_time is the long axis
(data/sequence parallelism analog) and channel is small (tensor-parallel
analog).  A (ping, channel) mesh shards the [C, P, R] blocks so range stays
contiguous per chip — collectives only carry binned partial sums over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(n_devices=None, channel_axis: int = 1, devices=None) -> Mesh:
    """Build a (ping, channel) mesh over available devices.

    channel_axis devices are assigned to the channel dimension (1 = pure
    ping sharding); the rest shard ping_time.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % channel_axis != 0:
        raise ValueError(f"n_devices={n} not divisible by channel_axis={channel_axis}")
    arr = np.array(devices).reshape(n // channel_axis, channel_axis)
    return Mesh(arr, axis_names=("ping", "channel"))
