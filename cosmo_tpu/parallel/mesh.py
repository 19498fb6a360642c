"""Device-mesh sharding for the conic ADMM solve.

The reference is a single-process shared-memory library (SURVEY.md §2,
"Parallelism & communication"); its scale axis is *algorithmic* — chordal
decomposition turns one large PSD cone into many small clique blocks.  On
TPU that axis becomes literal hardware parallelism:

* the PSD/SOC bucket stacks ``[B, k, k]`` are sharded along the batch
  (block) dimension of a 1-D ``jax.sharding.Mesh`` — each device projects
  its local clique blocks (the analog of expert/data parallelism),
* the rows of ``A``, ``b`` and all row-indexed vectors are sharded the same
  way, so the per-row ADMM updates and the SpMM in the KKT matvec are local,
* the consensus couplings (A'y products, residual inf-norms, CG dot
  products, termination flags) become XLA collectives (``psum`` /
  ``all_gather``) inserted automatically by GSPMD from the sharding
  annotations — they ride ICI.

The whole jitted solve is compiled once over the mesh; no host round-trips
inside the iteration loop.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"


def make_mesh(n_devices: int | None = None, axis: str = BLOCK_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"Requested {n_devices} devices but only {len(devs)} are available."
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _put(x, sharding):
    return jax.device_put(x, sharding)


def shard_cones(mesh: Mesh, cones, axis: str = BLOCK_AXIS):
    """Device-put the batched cone data with block-parallel shardings."""
    batch = NamedSharding(mesh, P(axis))
    batch2 = NamedSharding(mesh, P(axis, None))
    batch3 = NamedSharding(mesh, P(axis, None, None))
    rep = NamedSharding(mesh, P())

    soc = tuple(
        dataclasses.replace(bkt, idx=_put(bkt.idx, batch2))
        for bkt in cones.soc_buckets
    )
    psd = tuple(
        dataclasses.replace(
            bkt,
            gather_idx=_put(bkt.gather_idx, batch3),
            gather_scale=_put(bkt.gather_scale, batch3),
            scatter_idx=_put(bkt.scatter_idx, batch3),
            scatter_scale=_put(bkt.scatter_scale, batch3),
        )
        for bkt in cones.psd_buckets
    )
    exp = dataclasses.replace(
        cones.exp,
        idx=_put(cones.exp.idx, batch2),
        is_dual=_put(cones.exp.is_dual, batch),
    )
    pw = dataclasses.replace(
        cones.pow,
        idx=_put(cones.pow.idx, batch2),
        alpha=_put(cones.pow.alpha, batch),
        is_dual=_put(cones.pow.is_dual, batch),
    )
    row = NamedSharding(mesh, P(axis))
    return dataclasses.replace(
        cones,
        lb=_put(cones.lb, row),
        ub=_put(cones.ub, row),
        eq_mask=_put(cones.eq_mask, row),
        nonneg_mask=_put(cones.nonneg_mask, row),
        box_mask=_put(cones.box_mask, row),
        rect_mask=_put(cones.rect_mask, row),
        rect_seg=_put(cones.rect_seg, row),
        soc_buckets=soc,
        psd_buckets=psd,
        exp=exp,
        pow=pw,
    )


def shard_problem(mesh: Mesh, P_mat, A, q, b, cones, axis: str = BLOCK_AXIS):
    """Shard the problem data over the mesh.

    ``A``/``b`` row-sharded (constraint-parallel); ``P``/``q`` replicated
    (the x-space is the consensus space — small after decomposition);
    cone stacks block-sharded.
    """
    row = NamedSharding(mesh, P(axis))
    row2 = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    return (
        _put(P_mat, rep),
        _put(A, row2),
        _put(q, rep),
        _put(b, row),
        shard_cones(mesh, cones, axis),
    )
