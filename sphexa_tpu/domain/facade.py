"""Domain facade — the cstone::Domain analog
(reference: domain/include/cstone/domain/domain.hpp:66; the documented
10-step sync sequence at domain.hpp:181-195).

`Domain.sync()` bundles the whole per-step domain choreography that the
propagators previously re-implemented inline:

  global box keys -> quantile balance (psum'd histograms) -> one-hop
  all_to_all migration -> halo discovery/exchange -> cell sort of the
  extended frame -> neighbor lists + owner h adaptation -> a `refresh`
  handle for the per-stage halo field re-sends (exchangeHalos analog).

It runs INSIDE shard_map (all collectives are axis-named) and returns a
SyncResult; propagators then run their pair stages and call
`sr.refresh(fields)` at the reference's exchange points
(ve_hydro.hpp:132-205)."""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from sphexa_tpu.config import INDEX_DTYPE, SphConfig
from sphexa_tpu.domain.hilbert import (AXIS, HilbertConfig, balance_splits,
                                       exchange_halos, hilbert_keys, migrate,
                                       refresh_halo_fields)
from sphexa_tpu.neighbors import (CellGrid, build_cell_list,
                                  build_neighbor_list)
from sphexa_tpu.sfc.box import Box
from sphexa_tpu.state import Particles


class SyncResult(NamedTuple):
    exts: Particles          # extended (owned + halo) frame, cell-sorted
    owned: jnp.ndarray       # [ext] bool: row is an owned particle
    nl: Any                  # NeighborList over the extended frame
    refresh: Callable        # per-stage halo field re-send (tuple->tuple)
    ps: Particles            # owned frame after migration (for gravity)
    lost: jnp.ndarray        # migration + halo capacity losses (fail-stop)
    n_owned: jnp.ndarray     # this rank's owned count
    imbalance: jnp.ndarray   # max rank load / ideal load
    h_max: jnp.ndarray       # global h max (pmax)
    perm: jnp.ndarray        # cell-sort permutation (ext frame)
    inv_perm: jnp.ndarray


class Domain:
    """Facade over the Hilbert-quantile balanced domain. Construct once
    per (box, grid, cfg, hc); call sync() inside shard_map each step
    (the Domain::sync / syncGrav cadence, domain.hpp:196-318)."""

    def __init__(self, box: Box, grid: CellGrid, cfg: SphConfig,
                 hc: HilbertConfig):
        self.box = box
        self.grid = grid
        self.cfg = cfg
        self.hc = hc

    def sync(self, ps: Particles, adapt_h: bool = True) -> SyncResult:
        box, grid, cfg, hc = self.box, self.grid, self.cfg, self.hc

        if hc.key64:
            # level-20 keys: exact 60-bit quantile boundaries
            # (types.hpp:39-46 KeyType=uint64 analog)
            from sphexa_tpu.domain.hilbert import (balance_splits64,
                                                   owner_of64)
            from sphexa_tpu.sfc.hilbert64 import keys64_from_positions
            hi, lo = keys64_from_positions(box, ps.x, ps.y, ps.z)
            s_hi, s_lo = balance_splits64(hi, lo, ps.alive, hc)
            owner = owner_of64(hi, lo, s_hi, s_lo)
            ps, lost_mig, n_own0 = migrate(ps, box, None, hc, owner=owner)
        else:
            keys = hilbert_keys(box, ps.x, ps.y, ps.z)
            splits = balance_splits(keys, ps.alive, hc)
            ps, lost_mig, n_own0 = migrate(ps, box, splits, hc)
        imbalance = jax.lax.pmax(n_own0, AXIS).astype(jnp.float32) \
            * hc.n_ranks / jnp.maximum(
                jax.lax.psum(n_own0, AXIS).astype(jnp.float32), 1.0)

        h_max = jax.lax.pmax(jnp.max(jnp.where(ps.alive, ps.h, 0.0)), AXIS)

        ext, maps = exchange_halos(ps, box, hc)
        owned_ext = jnp.concatenate([
            ps.alive, jnp.zeros((hc.ext - hc.cap,), bool)])

        cl = build_cell_list(grid, box, ext.x, ext.y, ext.z,
                             alive=ext.alive)
        exts = ext.permute(cl.perm)
        owned = owned_ext[cl.perm]
        inv_perm = jnp.zeros((hc.ext,), INDEX_DTYPE).at[cl.perm].set(
            jnp.arange(hc.ext, dtype=INDEX_DTYPE))

        nl = build_neighbor_list(grid, box, cl, exts.x, exts.y, exts.z,
                                 exts.h, cfg, adapt_h=adapt_h,
                                 alive=exts.alive)
        refresh = functools.partial(refresh_halo_fields, maps=maps, hc=hc,
                                    inv_perm=inv_perm)
        if adapt_h:
            # halo rows have incomplete neighborhoods: keep the
            # exchanged h and pull the owner-adapted values
            h = jnp.where(owned, nl.h, exts.h)
            (h,) = refresh((h,))
            exts = exts.replace(h=h)

        lost = lost_mig + maps.send_lost
        return SyncResult(exts=exts, owned=owned, nl=nl, refresh=refresh,
                          ps=ps, lost=lost, n_owned=n_own0,
                          imbalance=imbalance, h_max=h_max,
                          perm=cl.perm, inv_perm=inv_perm)
