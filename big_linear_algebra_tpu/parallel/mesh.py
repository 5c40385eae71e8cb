"""Device-mesh construction over ICI (and DCN for multi-slice).

≈ nothing in the reference (single thread, SURVEY.md §2.4); this is the
framework's substrate for every distributed feature. Meshes are standard
``jax.sharding.Mesh`` objects so all sharded code works identically on one
chip, a v5e slice, or a CPU host with ``--xla_force_host_platform_device_count``
virtual devices (how tests validate multi-chip behavior without hardware).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(axes: Mapping[str, int],
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a named mesh, e.g. ``make_mesh({"data": 4, "model": 2})``.

    Axis sizes must multiply to the device count. Uses
    ``mesh_utils.create_device_mesh`` for ICI-aware device ordering when
    possible (falls back to a plain reshape off-TPU).
    """
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(
            f"mesh shape {dict(axes)} needs {n} devices, have {len(devices)}"
        )
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(shape, devices=list(devices))
    except Exception:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def default_mesh(data_axis: str = "data") -> Mesh:
    """All local devices on one data-parallel axis."""
    return make_mesh({data_axis: local_device_count()})
