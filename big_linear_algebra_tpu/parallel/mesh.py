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
    """Devices attached to THIS process (== jax.devices() on a single host;
    a strict subset on a multi-host slice)."""
    return len(jax.local_devices())


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
    return make_mesh({data_axis: local_device_count()},
                     devices=jax.local_devices())


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: ``jax.distributed.initialize`` with single-host
    no-op semantics (SURVEY.md §5 distributed-comm row).

    On a multi-host slice (or when the JAX coordination env vars are set),
    initializes the distributed runtime so ``jax.devices()`` spans every
    host; on a single host it does nothing. Safe to call twice. Returns the
    process index (0 on a single host)."""
    already = getattr(jax.distributed, "is_initialized", None)
    if already is not None and jax.distributed.is_initialized():
        return jax.process_index()
    import os

    def _multi_host_env() -> bool:
        # Cloud TPU pods export worker topology; jax.distributed.initialize
        # auto-discovers peers from it with no explicit coordinator. GKE /
        # manual launches set a coordinator address instead.
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len([h for h in hosts.split(",") if h]) > 1:
            return True
        return any(v in os.environ for v in (
            "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
            "JAX_COORDINATION_SERVICE_ADDRESS"))

    if (coordinator_address is None and num_processes is None
            and not _multi_host_env()):
        return 0  # single-host: nothing to initialize
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def make_hybrid_mesh(dcn_axes: Mapping[str, int],
                     ici_axes: Mapping[str, int]) -> Mesh:
    """DCN-aware mesh for multi-slice topologies (SURVEY.md §2.4/§5).

    ``dcn_axes`` partition across slices (data-center network — slow, so put
    only the data-parallel axis here); ``ici_axes`` partition within a slice
    (inter-chip interconnect — fast, for TP/SP/PP). Axis order in the
    returned mesh is DCN axes first, then ICI axes, so shardings that keep
    collectives on ICI fall out of the axis names.

    Falls back to a flat ``make_mesh`` over all devices when every device is
    in one slice (single-slice TPU, CPU virtual devices) — dcn axes must
    then be size 1."""
    names = tuple(dcn_axes.keys()) + tuple(ici_axes.keys())
    if len(set(names)) != len(names):
        # the multi-slice path would raise from Mesh on duplicate names;
        # the single-slice fallback's dict(zip(...)) would silently MERGE
        # them into a mesh missing an axis — validate up front so both
        # paths behave the same
        dup = sorted(n for n in set(names) if names.count(n) > 1)
        raise ValueError(f"axis names appear in both dcn_axes and "
                         f"ici_axes: {dup}")
    shape = tuple(dcn_axes.values()) + tuple(ici_axes.values())
    devices = jax.devices()
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices > 1:
        from jax.experimental import mesh_utils

        # create_hybrid_device_mesh takes same-rank shapes and returns their
        # elementwise product; pad with 1s so the result's axes are exactly
        # (dcn..., ici...) concatenated
        nd, ni = len(dcn_axes), len(ici_axes)
        dev_array = mesh_utils.create_hybrid_device_mesh(
            (1,) * nd + tuple(ici_axes.values()),
            tuple(dcn_axes.values()) + (1,) * ni,
            devices=devices)
        return Mesh(dev_array, names)
    if int(np.prod(tuple(dcn_axes.values()))) != 1:
        raise ValueError(
            f"dcn_axes {dict(dcn_axes)} need {np.prod(tuple(dcn_axes.values()))} "
            f"slices but all {len(devices)} devices are in one slice")
    return make_mesh(dict(zip(names, shape)))
