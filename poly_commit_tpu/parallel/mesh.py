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

import contextlib
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

# ---------------------------------------------------------------------------
# active-mesh context: schemes consult this so multi-chip execution is a
# caller-side `with use_mesh(mesh):` rather than a parameter threaded through
# every scheme API (the analogue of the reference's global rayon pool that
# every cfg_iter! implicitly targets, SURVEY.md §5.8)
# ---------------------------------------------------------------------------

_ACTIVE: list = []


@contextlib.contextmanager
def use_mesh(mesh: Mesh, axis: str | None = None):
    """Route the schemes' SRS-sized MSMs through ``msm_sharded`` over
    ``mesh`` for the duration of the context."""
    _ACTIVE.append((mesh, axis or mesh.axis_names[0]))
    try:
        yield mesh
    finally:
        _ACTIVE.pop()


def active_mesh():
    """(mesh, axis) of the innermost use_mesh context, or None."""
    return _ACTIVE[-1] if _ACTIVE else None


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


def make_mesh_3d(n_dp: int, n_tp: int, n_pp: int) -> Mesh:
    """3-D mesh: 'dp' shards MSM bases/scalars, 'tp' shards the NTT
    coefficient axis, 'pp' shards independent work batches (rows of
    transforms / per-poly commits) — the dp x tp x host shape of a
    multi-host slice (SURVEY.md §2.5/§5.8)."""
    devs = jax.devices()
    assert n_dp * n_tp * n_pp <= len(devs)
    return Mesh(
        np.asarray(devs[: n_dp * n_tp * n_pp]).reshape(n_dp, n_tp, n_pp),
        ("dp", "tp", "pp"),
    )


def _fold_gathered(group, gathered, n_dev: int):
    """(n_dev, ...) pytree of projective points -> single point.

    n_dev is tiny (mesh size); a static unrolled chain of group adds.
    """
    acc = jax.tree_util.tree_map(lambda a: a[0], gathered)
    for i in range(1, n_dev):
        acc = group.add(acc, jax.tree_util.tree_map(lambda a, i=i: a[i], gathered))
    return acc


@functools.lru_cache(maxsize=64)
def _msm_sharded_fn(group, mesh: Mesh, axis: str, c, lanes,
                    assume_distinct: bool):
    """Jitted shard_map MSM, cached per (group, mesh, axis, kernel params):
    rebuilding the shard_map closure per call would re-trace AND re-compile
    every call — fatal on XLA:CPU where one EC compile takes minutes."""
    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def local(sc, x, y, inf):
        part = M.msm(group, sc, (x, y, inf), c, lanes,
                     assume_distinct=assume_distinct)
        gathered = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, axis), part
        )
        return _fold_gathered(group, gathered, n_dev)

    pt_specs = tuple(PSpec(axis) for _ in range(3))
    out_proto = group.infinity(())
    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(PSpec(axis),) + pt_specs,
        out_specs=jax.tree_util.tree_map(lambda _: PSpec(), out_proto),
        check_rep=False,
    ))


def msm_sharded(group, scalars: jnp.ndarray, points, mesh: Mesh,
                c: int | None = None, lanes: int | None = None,
                axis: str | None = None, assume_distinct: bool = False):
    """MSM with bases+scalars sharded over a mesh axis (default: first).

    scalars: (N, 16) plain limbs; points: affine (x, y, inf) batched (N, ...).
    N must be divisible by the axis size (pad with inf points otherwise —
    see :func:`pad_msm_inputs`). Returns a replicated projective point.

    With c/lanes None the per-device kernel uses the normal dispatch — the
    limbs-first fast path on TPU (or POLY_COMMIT_FAST_MSM=1), the naive
    double-and-add kernel for tiny local shards; explicit c/lanes pins the
    portable Pippenger kernel.
    """
    axis = axis or mesh.axis_names[0]
    fn = _msm_sharded_fn(group, mesh, axis, c, lanes, assume_distinct)
    x, y, inf = points
    return fn(scalars, x, y, inf)


@functools.lru_cache(maxsize=32)
def _batch_msm_sharded_fn(group, mesh: Mesh, axis: str, assume_distinct: bool):
    """Independent per-row MSMs with the ROW axis sharded (DP analogue —
    the reference's rayon loop over Hyrax row commits, hyrax/mod.rs:233-242,
    SURVEY §2.5 DP row). Bases are replicated; no collective needed."""

    def local(rows, x, y, inf):
        def one(row):
            return M.msm(group, row, (x, y, inf),
                         assume_distinct=assume_distinct)

        return jax.vmap(one)(rows)

    out_proto = group.infinity((1,))
    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(PSpec(axis), PSpec(), PSpec(), PSpec()),
        out_specs=jax.tree_util.tree_map(lambda _: PSpec(axis), out_proto),
        check_rep=False,
    ))


def batch_msm_sharded(group, rows, points, mesh: Mesh, axis: str | None = None,
                      assume_distinct: bool = False):
    """rows: (B, N, 16) plain scalars, one MSM per row over shared points.
    B must be divisible by the axis size. Returns projective batch (B,)."""
    axis = axis or mesh.axis_names[0]
    fn = _batch_msm_sharded_fn(group, mesh, axis, assume_distinct)
    x, y, inf = points
    return fn(rows, x, y, inf)


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


@functools.lru_cache(maxsize=16)
def _cross_twiddles(spec, n1: int, n2: int, inverse: bool):
    """w^{± i2*k1} for the six-step decomposition as numpy (n2, n1, L)
    Montgomery limbs (host-precomputed constant, sharded over i2 rows)."""
    d = NTT.domain(spec, int(np.log2(n1 * n2)))
    pows = d["ipows"] if inverse else d["pows"]
    n = n1 * n2
    tab = np.empty((n2, n1), dtype=object)
    for i2 in range(n2):
        for k1 in range(n1):
            tab[i2, k1] = int(pows[(i2 * k1) % n])
    flat = [tab[i, j] for i in range(n2) for j in range(n1)]
    return F.from_ints_np(spec, flat).reshape(n2, n1, spec.n_limbs)


def _transpose_sharded(x, axis: str, n_dev: int):
    """Local block (R/D, C, L) of a row-sharded (R, C) global -> local block
    (C/D, R, L) of the column-sharded transpose; ONE all_to_all."""
    rD, ccols, L = x.shape
    # split columns into D chunks and exchange: -> (R, C/D, L)
    y = jax.lax.all_to_all(
        x.reshape(rD, n_dev, ccols // n_dev, L), axis, 1, 0, tiled=True
    ).reshape(rD * n_dev, ccols // n_dev, L)
    return jnp.swapaxes(y, 0, 1)  # (C/D, R, L)


def ntt_sharded(spec, coeffs: jnp.ndarray, mesh: Mesh, inverse: bool = False,
                axis: str | None = None):
    """Distributed radix-2 NTT: six-step decomposition with `all_to_all`
    transposes over ICI (SURVEY §2.5 TP row; replaces the reference's
    single-threadpool fft, linear_codes/utils.rs:112-127).

    View the length-n coefficient vector as an (n1, n2) row-major matrix
    (n1 = n_dev): size-n1 column transforms become LOCAL batched NTTs after
    one all_to_all transpose, the cross twiddle w^{i2*k1} is a sharded
    constant, and the size-n2 row transforms are local after a second
    transpose; a third transpose restores standard-order contiguous
    sharding. Communication: 3 all_to_alls (~n elements each), no
    full-array gather. Sizes below n_dev^2 fall back to the gather path.
    """
    axis = axis or mesh.axis_names[0]
    n = coeffs.shape[0]
    fn = _ntt_sharded_fn(spec, mesh, axis, n, inverse)
    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    if n_dev == 1 or n % (n_dev * n_dev) != 0:
        return fn(coeffs)
    tw = jnp.asarray(_cross_twiddles(spec, n_dev, n // n_dev, inverse))
    return fn(coeffs, tw)


@functools.lru_cache(maxsize=64)
def _ntt_sharded_fn(spec, mesh: Mesh, axis: str, n: int, inverse: bool):
    """Jitted shard_map NTT, cached per (spec, mesh, axis, size, dir) —
    same re-trace/re-compile hazard as _msm_sharded_fn."""
    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    if n_dev == 1 or n % (n_dev * n_dev) != 0:
        # small/ragged fallback: gather + local transform
        def local_small(a):
            full = jax.lax.all_gather(a, axis, tiled=True)
            out = NTT.intt(spec, full) if inverse else NTT.ntt(spec, full)
            idx = jax.lax.axis_index(axis)
            shard = out.shape[0] // n_dev
            return jax.lax.dynamic_slice_in_dim(out, idx * shard, shard, axis=0)

        return jax.jit(shard_map(
            local_small, mesh=mesh, in_specs=PSpec(axis),
            out_specs=PSpec(axis), check_rep=False,
        ))

    n1, n2 = n_dev, n // n_dev
    sub = NTT.intt if inverse else NTT.ntt

    def local(a, tw_loc):
        # a: (n/D, L) = rows [d*n1/D ...] of the (n1, n2) view — i.e. the
        # device's contiguous slice; as (n1/D, n2, L)
        L = a.shape[-1]
        blk = a.reshape(n1 // n_dev, n2, L)
        # transpose 1: -> (n2/D, n1, L), indexed [i2, i1]
        b = _transpose_sharded(blk, axis, n_dev)
        # size-n1 transforms over i1 (last-but-one axis is batch)
        b = sub(spec, b)  # (..., n1, L) transform along axis -2
        # cross twiddles (sharded over i2 rows like b)
        b = F.mont_mul(spec, b, tw_loc)
        # transpose 2: -> (n1/D, n2, L), indexed [k1, i2]
        c = _transpose_sharded(b, axis, n_dev)
        # size-n2 transforms over i2
        c = sub(spec, c)  # [k1, k2]
        # transpose 3: -> (n2/D, n1, L) indexed [k2, k1]; flatten to the
        # standard order X[k2*n1 + k1]
        x = _transpose_sharded(c, axis, n_dev)
        return x.reshape(n // n_dev, L)

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(PSpec(axis), PSpec(axis)),
        out_specs=PSpec(axis), check_rep=False,
    ))


@functools.lru_cache(maxsize=32)
def _batch_ntt_sharded_fn(spec, mesh: Mesh, axis: str, inverse: bool):
    """Independent per-row NTTs with the ROW axis sharded (the Ligero
    RS-encode layout: each device transforms its own rows, zero
    communication — SURVEY §2.5 DP row vs the reference's rayon row loop,
    linear_codes/mod.rs:131-135)."""

    def local(rows):
        return NTT.intt(spec, rows) if inverse else NTT.ntt(spec, rows)

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=PSpec(axis), out_specs=PSpec(axis),
        check_rep=False,
    ))


def batch_ntt_sharded(spec, rows: jnp.ndarray, mesh: Mesh,
                      axis: str | None = None, inverse: bool = False):
    """rows: (R, n, L) — R independent transforms, R divisible by the axis
    size. Returns (R, n_out, L)."""
    axis = axis or mesh.axis_names[0]
    return _batch_ntt_sharded_fn(spec, mesh, axis, inverse)(rows)


@functools.lru_cache(maxsize=32)
def _row_mul_sharded_fn(spec, mesh: Mesh, axis: str):
    """v^T M with the ROW axis sharded: local log-depth partial sums, one
    all_gather, D field adds (the reference rayon-parallelizes this same
    loop, linear_codes/mod.rs:523-566). Field sums are order-independent
    mod p and F.add returns canonical limbs, so the result is bit-identical
    to the single-chip kernel."""
    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def local(vec, mat):
        prod = F.mont_mul(spec, vec[:, None, :], mat)
        n = prod.shape[0]
        while n > 1:
            half = n // 2
            head = F.add(spec, prod[:half], prod[half : 2 * half])
            prod = (
                head
                if n % 2 == 0
                else jnp.concatenate([head, prod[n - 1 :]], 0)
            )
            n = (n + 1) // 2
        part = prod[0]  # (cols, L)
        parts = jax.lax.all_gather(part, axis)  # (D, cols, L)
        acc = parts[0]
        for i in range(1, n_dev):
            acc = F.add(spec, acc, parts[i])
        return acc

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(PSpec(axis), PSpec(axis)),
        out_specs=PSpec(), check_rep=False,
    ))


def row_mul_sharded(spec, vec: jnp.ndarray, mat: jnp.ndarray, mesh: Mesh,
                    axis: str | None = None):
    """v (n, L) times M (n, cols, L) -> (cols, L), rows sharded over the
    mesh axis (n divisible by the axis size); result replicated."""
    axis = axis or mesh.axis_names[0]
    return _row_mul_sharded_fn(spec, mesh, axis)(vec, mat)


@functools.lru_cache(maxsize=32)
def _fold_key_sharded_fn(group, mesh: Mesh, axis: str):
    """IPA key fold key_l + ch*key_r with the point axis sharded — pure
    elementwise (no collective), mirroring the reference's rayon fold
    (ipa_pc/mod.rs:691-701). Bit-identical: per-lane ops are unchanged."""

    def local(kxl, kyl, kil, kxr, kyr, kir, bits):
        kr_mul = group.scalar_mul(group.from_affine(kxr, kyr, kir), bits)
        kl = group.from_affine(kxl, kyl, kil)
        return group.to_affine(group.add(kl, kr_mul))

    specs = (PSpec(axis),) * 6 + (PSpec(),)
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=specs,
        out_specs=(PSpec(axis), PSpec(axis), PSpec(axis)),
        check_rep=False,
    ))


def fold_key_sharded(group, k_l, k_r, scalar_bits, mesh: Mesh,
                     axis: str | None = None):
    """Affine key halves (x, y, inf) batched (n/2, ...); returns the folded
    affine key sharded the same way. n/2 must divide by the axis size."""
    axis = axis or mesh.axis_names[0]
    fn = _fold_key_sharded_fn(group, mesh, axis)
    return fn(*k_l, *k_r, scalar_bits)


def shard_batch(arr, mesh: Mesh, axis: str | None = None):
    """Place a batch-leading array sharded over a mesh axis (DP analogue)."""
    axis = axis or mesh.axis_names[0]
    return jax.device_put(arr, NamedSharding(mesh, PSpec(axis)))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, PSpec())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
