"""Device-mesh helpers for ICI-sharded library search.

The reference is single-node/single-GPU (SURVEY.md §2.3); the TPU-native
scale axis is *library sharding*: IVF lists / library rows sharded across
chips over ICI, queries data-parallel, per-shard top-k merged with
all-gathers.  DCN would only enter for multi-slice 100M+ builds.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, str] = ("dp", "lib"),
    dp_size: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Create a (dp, lib) mesh over the first `n_devices` devices.

    `dp` carries data-parallel query batches, `lib` carries library shards.
    By default dp gets the smaller factor so large libraries get the most
    shards.  Pass `devices` explicitly to pin the mesh to a specific
    backend (e.g. virtual CPU devices for multi-chip dry runs).
    """
    devices = list(devices) if devices is not None else jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        # Fall back to virtual CPU devices
        # (xla_force_host_platform_device_count) for multi-chip dry runs on
        # single-chip or chipless hosts.
        devices = jax.devices("cpu")
    if len(devices) < n_devices:
        raise ValueError(
            f"Requested {n_devices} devices but only {len(devices)} "
            f"are available"
        )
    devices = devices[:n_devices]
    if dp_size is None:
        # Largest power-of-two dp that keeps lib >= dp.
        dp_size = 1
        while (
            dp_size * 2 <= n_devices
            and n_devices % (dp_size * 2) == 0
            and (n_devices // (dp_size * 2)) >= dp_size * 2
        ):
            dp_size *= 2
    if n_devices % dp_size != 0:
        raise ValueError(
            f"dp_size={dp_size} does not divide n_devices={n_devices}"
        )
    lib_size = n_devices // dp_size
    device_array = np.asarray(devices).reshape(dp_size, lib_size)
    return Mesh(device_array, axis_names)


def make_multislice_mesh(
    n_slices: int,
    devices_per_slice: Optional[int] = None,
    dp_size: int = 1,
    devices=None,
) -> Mesh:
    """A ('dcn', 'dp', 'lib') mesh for multi-slice 100M+-vector builds.

    Axis layout follows the JAX multi-slice convention: the slowest
    (outer) mesh axis maps to the slice boundary so collectives along it
    ride DCN while 'dp'/'lib' collectives stay on ICI within a slice.
    Library lists shard over the combined ('dcn', 'lib') axes -- the
    per-shard top-k merge is one k-sized all-gather per axis, so DCN
    traffic stays O(k * n_slices), independent of library size.

    On real multi-slice systems `jax.devices()` orders devices
    slice-major, which is exactly the reshape below; on a virtual CPU
    mesh this validates compilation and collective layout.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if devices_per_slice is None:
        devices_per_slice = max(1, len(devices) // n_slices)
    n = n_slices * devices_per_slice
    if len(devices) < n:
        # Fall back to virtual CPU devices (same escape hatch as
        # make_mesh) for multi-slice dry runs on small hosts.
        devices = jax.devices("cpu")
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for {n_slices} x {devices_per_slice}, "
            f"have {len(devices)}"
        )
    if devices_per_slice % dp_size != 0:
        raise ValueError("dp_size must divide devices_per_slice")
    lib_size = devices_per_slice // dp_size
    device_array = np.asarray(devices[:n]).reshape(
        n_slices, dp_size, lib_size
    )
    return Mesh(device_array, ("dcn", "dp", "lib"))


def pad_to_multiple(
    array: np.ndarray, multiple: int, axis: int = 0, fill=0
) -> np.ndarray:
    """Pad `axis` up to a multiple (shard-evenly helper)."""
    size = array.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return array
    pad_widths = [(0, 0)] * array.ndim
    pad_widths[axis] = (0, target - size)
    return np.pad(array, pad_widths, constant_values=fill)
