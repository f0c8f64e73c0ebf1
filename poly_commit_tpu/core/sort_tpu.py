"""In-VMEM Pallas bitonic argsort for the MSM digit grouping (TPU).

Replaces XLA's comparator sort in core/msm_tpu._sort_by_digit — the
single largest MSM stage (measured 1.9 s for 16 x 2^20 u32 keys at 2^20,
~30x off the HBM roofline; BASELINE.md round-4 table). The reference's
analogue is rayon's parallel grouping inside ark-ec's msm_bigint
(`/root/reference/poly-commit` -> ark-ec VariableBaseMSM); here grouping
IS the TPU bottleneck, so it gets its own kernel.

Design (why this beats both XLA sort and a jnp bitonic network):

* A bitonic phase exchanges element i with i XOR d. At jnp level, any
  d < 128 reshape/slice formulation forces lane-crossing relayouts (the
  measured 3.1 s failure mode). Inside Pallas the XOR shuffle is TWO
  `pltpu.roll`s + a select — rolls are hardware lane/sublane rotations,
  so small-stride phases never touch HBM or relayout.
* Phases with stride < B run entirely inside one VMEM block of B
  elements. Sorting is therefore blocked: one kernel fully sorts each
  B=2^17 block (stages 1..17 of the network, ~150 phases, k+v resident
  in <2 MB of VMEM), then each global merge stage KK runs its few
  strides >= B at XLA level (contiguous >=512 KB slices — bandwidth
  bound, no relayout) and finishes its 17 block-local strides in a
  second Pallas kernel. At N=2^20 that is 6 XLA phases total vs 210 for
  a full jnp network.
* Direction bits: compare direction for stage kk is bit kk of the
  element's GLOBAL index; for block-local phases that bit is a function
  of the block id only, so it enters the kernel through `program_id`.

Not stable — Pippenger needs bucket GROUPING, not ordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
BLOCK = 1 << 17  # elements per VMEM block (k+v = 1 MB)


def _xor_partner(x, d):
    """value at logical index i XOR d; x is (R, 128), i = r*128 + c."""
    from jax.experimental.pallas import tpu as pltpu

    if d < LANES:
        fwd = pltpu.roll(x, LANES - d, 1)  # value at lane c+d
        bwd = pltpu.roll(x, d, 1)  # value at lane c-d
        c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((c & d) == 0, fwd, bwd)
    m = d // LANES
    rows = x.shape[0]
    fwd = pltpu.roll(x, rows - m, 0)  # value at row r+m
    bwd = pltpu.roll(x, m, 0)  # value at row r-m
    r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((r & m) == 0, fwd, bwd)


def _cmpex(k, v, i, d, desc):
    """One compare-exchange pass at stride d.

    keep_min[i] = ((i & d) == 0) XOR desc[i]; ties keep both sides'
    own payloads (strict compares are complementary, so the pair always
    exchanges consistently)."""
    pk = _xor_partner(k, d)
    pv = _xor_partner(v, d)
    keep_min = jnp.logical_xor((i & d) == 0, desc)
    # no jnp.where on bool operands: Mosaic can't truncate i8 selects to i1
    take = jnp.logical_or(
        jnp.logical_and(keep_min, pk < k),
        jnp.logical_and(jnp.logical_not(keep_min), pk > k),
    )
    return jnp.where(take, pk, k), jnp.where(take, pv, v)


def _local_kernel(log_b, k_ref, v_ref, ko_ref, vo_ref):
    """Full bitonic sort of one block: stages 1..log_b. Direction for the
    top stage is bit log_b of the global index == bit 0 of the block id
    (ascending when this block is the whole array: id 0)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]
    i = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0) * LANES + (
        jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    )
    for kk in range(1, log_b + 1):
        if kk < log_b:
            desc = ((i >> kk) & 1) == 1
        else:
            desc = (b & 1) == 1
        for j in range(kk - 1, -1, -1):
            k, v = _cmpex(k, v, i, 1 << j, desc)
    ko_ref[0] = k
    vo_ref[0] = v


def _tail_kernel(log_b, shift, k_ref, v_ref, ko_ref, vo_ref):
    """Block-local tail (strides B/2..1) of global merge stage
    KK = log_b + shift; direction = bit KK of the global index
    = bit `shift` of the block id."""
    from jax.experimental import pallas as pl

    b = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]
    i = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0) * LANES + (
        jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    )
    desc = ((b >> shift) & 1) == 1
    for j in range(log_b - 1, -1, -1):
        k, v = _cmpex(k, v, i, 1 << j, desc)
    ko_ref[0] = k
    vo_ref[0] = v


def _xla_phase(k, v, n, stride, kk):
    """Compare-exchange at stride >= BLOCK via contiguous reshape/slice
    (no lane crossing at these strides)."""
    w = k.shape[0]
    m = n // (2 * stride)
    outer = np.arange(m, dtype=np.int64) * (2 * stride)
    desc = jnp.asarray(((outer >> kk) & 1).astype(np.bool_)).reshape(1, m, 1)
    ks = k.reshape(w, m, 2, stride)
    vs = v.reshape(w, m, 2, stride)
    ka, kb = ks[:, :, 0], ks[:, :, 1]
    va, vb = vs[:, :, 0], vs[:, :, 1]
    swap = (ka > kb) ^ desc
    k = jnp.stack(
        [jnp.where(swap, kb, ka), jnp.where(swap, ka, kb)], axis=2
    ).reshape(w, n)
    v = jnp.stack(
        [jnp.where(swap, vb, va), jnp.where(swap, va, vb)], axis=2
    ).reshape(w, n)
    return k, v


def _pallas_pass(kernel, w, nb, rows, k3, v3, interpret):
    from jax.experimental import pallas as pl

    spec = pl.BlockSpec((1, rows, LANES), lambda wi, bi: (wi, bi, 0))
    shape = jax.ShapeDtypeStruct(k3.shape, jnp.uint32)
    vshape = jax.ShapeDtypeStruct(v3.shape, jnp.int32)
    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        # k+v in/out double-buffered + roll temps overflow the default
        # 16 MB scoped window at BLOCK=2^17; v5e has 128 MB physical VMEM
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid=(w, nb),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(shape, vshape),
        interpret=interpret,
        **kwargs,
    )(k3, v3)


@functools.lru_cache(maxsize=32)
def _sorter(w: int, n: int, interpret: bool):
    log_n = n.bit_length() - 1
    block = min(n, BLOCK)
    log_b = block.bit_length() - 1
    nb = n // block
    rows = block // LANES

    def run(keys):
        vals = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, n), 1), (w, n)
        )
        k3 = keys.reshape(w, n // LANES, LANES)
        v3 = vals.reshape(w, n // LANES, LANES)
        k3, v3 = _pallas_pass(
            functools.partial(_local_kernel, log_b), w, nb, rows, k3, v3,
            interpret,
        )
        k = k3.reshape(w, n)
        v = v3.reshape(w, n)
        for kk in range(log_b + 1, log_n + 1):
            for j in range(kk - 1, log_b - 1, -1):
                k, v = _xla_phase(k, v, n, 1 << j, kk)
            k3 = k.reshape(w, n // LANES, LANES)
            v3 = v.reshape(w, n // LANES, LANES)
            k3, v3 = _pallas_pass(
                functools.partial(_tail_kernel, log_b, kk - log_b),
                w, nb, rows, k3, v3, interpret,
            )
            k = k3.reshape(w, n)
            v = v3.reshape(w, n)
        return v, k

    return jax.jit(run)


def supported(n: int) -> bool:
    """power-of-two N with at least 8 sublane rows per block."""
    return n >= 8 * LANES and (n & (n - 1)) == 0


def bitonic_argsort(keys: jnp.ndarray, interpret: bool = False):
    """(W, N) u32 -> (order i32, sorted u32), each window independently.

    N must satisfy `supported`. `interpret=True` runs the Pallas kernels
    in interpreter mode (CPU testing)."""
    w, n = keys.shape
    assert supported(n), n
    return _sorter(w, n, interpret)(keys)
