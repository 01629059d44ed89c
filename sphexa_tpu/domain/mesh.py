"""Mesh construction helpers, including multi-slice (DCN) layouts
(reference scaling axis: MPI across nodes; here ICI within a slice +
DCN between slices — docs/DESIGN.md 'Multi-slice (DCN) meshes')."""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh


def make_slab_mesh(devices, axis: str, chips_per_slice: int = 0) -> Mesh:
    """1-D slab/column mesh with devices ordered slice-major, so the
    +-1 ppermute ring crosses DCN exactly once per slice boundary.

    Devices that expose `.slice_index` (multi-slice TPU backends) are
    grouped by it; otherwise `chips_per_slice` partitions the flat
    list (0 = single slice, keep given order)."""
    devices = list(devices)
    if devices and getattr(devices[0], "slice_index", None) is not None:
        devices.sort(key=lambda d: (d.slice_index, d.id))
    elif chips_per_slice > 0:
        n_slices = -(-len(devices) // chips_per_slice)
        by_slice = [devices[s * chips_per_slice:(s + 1) * chips_per_slice]
                    for s in range(n_slices)]
        devices = [d for grp in by_slice for d in grp]
    return Mesh(np.array(devices), (axis,))
