"""Multi-chip sharding plan: cone-block data parallelism over a device mesh.

Reference analog: none — the reference is single-process (SURVEY.md
section 2.8); this is new, first-class scope for the TPU build.

Design (SURVEY.md section 7 item 7): the dominant axis of parallelism in a
conic IPM is the *cone-block* axis — every Jordan kernel (scaling, eig,
congruence), the per-block congruences B = R'AR of the Schur formation, and
the O(m^2 * blockdata) contraction ADA = sum_k B_k B_k' are embarrassingly
parallel over blocks, with a single psum-shaped reduction into ADA.  We
annotate the block axis of the bucketed operator/state with a NamedSharding
over mesh axis "blocks" and let XLA's SPMD partitioner place the
all-reduce over ICI; the (m x m) Schur complement and factorization stay
replicated (m is small relative to block data in the target workloads —
panel-sharded factorization is the next scaling lever).

Nothing in ipm.make_step changes: sharding propagates from the input
annotations through the jitted step (the XLA-first design bet).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ipm import IPMState
from ..opA import DenseAOp
from ..structs import ConeVec

BLOCK_AXIS = "blocks"


def make_mesh(n_devices: int | None = None, axis: str = BLOCK_AXIS,
              shape: dict | None = None) -> Mesh:
    """Flat 1-axis mesh, or a multi-axis mesh from an ordered shape dict.

    Multi-host plan (SURVEY.md section 5, distributed backend): a leading
    "hosts" axis maps to the DCN dimension and trailing axes to ICI —
    e.g. shape={"hosts": 2, "blocks": 4}.  Cone blocks shard over ALL
    data axes (the per-block kernels are embarrassingly parallel; the one
    ADA reduction becomes a hierarchical psum, ICI-first then DCN, by
    XLA's collective lowering on the 2-D mesh).  The Schur-panel engine
    takes a single named axis (keep panels on an ICI axis — its per-column
    all-gathers are latency-sensitive)."""
    if shape:
        dims = tuple(int(v) for v in shape.values())
        devs = jax.devices()[: int(np.prod(dims))]
        return Mesh(np.array(devs).reshape(dims), tuple(shape.keys()))
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _nshards(mesh: Mesh, axis) -> int:
    if isinstance(axis, (tuple, list)):
        return int(np.prod([mesh.shape[a] for a in axis]))
    return mesh.shape[axis]


def _put(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda x: _put(x, mesh, P()), tree)


def shard_aop(aop: DenseAOp, mesh: Mesh, axis=BLOCK_AXIS) -> DenseAOp:
    """Shard the cone-block axis of the bucketed operator.

    Al [m+1, nl] is replicated (LP part is cheap); Aq [m+1, count, d] and
    As [m+1, count, d, d] are sharded along `count` when it divides the
    mesh, replicated otherwise.  `axis` may be a tuple of mesh axes (2-D
    hosts x blocks mesh): blocks then shard over their product.
    """
    n = _nshards(mesh, axis)

    def spec(count):
        # operators are flat [m+1, count*inner]; splitting the flat column
        # axis n ways aligns with block boundaries iff n divides count
        if count and count % n == 0:
            return P(None, axis)
        return P()

    return DenseAOp(
        Al=_put(aop.Al, mesh, P()),
        Aq=[_put(a, mesh, spec(c)) for a, (c, _) in zip(aop.Aq, aop.q_shapes)],
        As=[_put(a, mesh, spec(c)) for a, (c, _) in zip(aop.As, aop.s_shapes)],
        q_shapes=aop.q_shapes,
        s_shapes=aop.s_shapes,
    )


def shard_coo_aop(aop, mesh: Mesh, axis=BLOCK_AXIS):
    """Shard a CooAOp's dense buckets over the block axis; COO-represented
    buckets are replicated (their segment-sum Schur formation is already a
    single reduction; sharding the gather axis has no win at current scale).
    """
    from ..opA import CooAOp

    n = _nshards(mesh, axis)

    def spec(count):
        if count and count % n == 0:
            return P(None, axis)
        return P()

    parts = []
    for part, (rep, k, d, G, pad2, T) in zip(aop.s_parts, aop.s_meta):
        if rep == "dense":
            parts.append({"mat": _put(part["mat"], mesh, spec(k))})
        else:
            parts.append({key: _put(a, mesh, P()) for key, a in part.items()})
    return CooAOp(
        Al=_put(aop.Al, mesh, P()),
        Aq=[_put(a, mesh, spec(c)) for a, (c, _) in zip(aop.Aq, aop.q_shapes)],
        s_parts=parts,
        q_shapes=aop.q_shapes,
        s_meta=aop.s_meta,
    )


def shard_conevec(v: ConeVec, mesh: Mesh, axis=BLOCK_AXIS) -> ConeVec:
    n = _nshards(mesh, axis)

    def spec(count, trailing):
        if count and count % n == 0:
            return P(axis, *([None] * trailing))
        return P()

    return ConeVec(
        l=_put(v.l, mesh, P()),
        q=tuple(_put(a, mesh, spec(a.shape[0], 1)) for a in v.q),
        s=tuple(_put(a, mesh, spec(a.shape[0], 2)) for a in v.s),
    )


def shard_state(state: IPMState, mesh: Mesh, axis=BLOCK_AXIS) -> IPMState:
    return IPMState(
        x=shard_conevec(state.x, mesh, axis),
        y=_put(state.y, mesh, P()),
        z=shard_conevec(state.z, mesh, axis),
        tau=_put(state.tau, mesh, P()),
        kappa=_put(state.kappa, mesh, P()),
    )
