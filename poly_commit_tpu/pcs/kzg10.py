"""KZG10 polynomial commitments (the building block for Marlin/Sonic PCs).

TPU-native re-design of /root/reference/poly-commit/src/kzg10/mod.rs:
  setup        mod.rs:53-124   (SRS powers via fixed-base windowed mul kernel)
  commit       mod.rs:157-210  (variable-base MSM kernel + hiding MSM)
  open         mod.rs:243-310  (witness poly = synthetic-division scan + MSM)
  check        mod.rs:314-333  (2-pairing product check)
  batch_check  mod.rs:337-391  (128-bit-randomizer RLC into one 2-pairing check)

Like the reference, this module is *not* a PolynomialCommitment impl — the
Marlin/Sonic schemes wrap it with degree-bound/batching logic.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core import curve as C
from ..core import field as F
from ..core import msm as M
from ..core import pairing as PR
from ..core import poly as P
from ..core.field_params import FR_BLS12_381
from . import errors
from .curve_ctx import CTX_BLS12_381, CurveCtx
from .data_structures import HostRng
from ..utils.trace import traced

# module-level defaults (BLS12-381); every function also accepts a
# CurveCtx for the second reference curve (BLS12-377) -- the analogue of
# the reference's generics over `Pairing` (marlin_pc/mod.rs:531-815)
G1 = C.BLS12_381_G1
G2 = C.BLS12_381_G2
SPEC = FR_BLS12_381


@dataclasses.dataclass
class UniversalParams:
    """kzg10/data_structures.rs:22-39 (prepared elements are not persisted;
    we have no pairing-precomputation to rebuild)."""

    powers_of_g: tuple  # device affine (x, y, inf), batch (D+1,)
    powers_of_gamma_g: tuple  # batch (D+2,)
    h: tuple  # device G2 affine, batch ()
    beta_h: tuple
    neg_powers_of_h: Optional[tuple] = None  # (D+1,) for Sonic
    max_degree: int = 0


@dataclasses.dataclass
class Powers:
    """Committer key slice (kzg10/data_structures.rs:124-136)."""

    powers_of_g: tuple
    powers_of_gamma_g: tuple

    def size(self):
        return int(self.powers_of_g[0].shape[0])


@dataclasses.dataclass
class VerifierKey:
    """kzg10/data_structures.rs:187-202."""

    g: tuple  # device G1 affine ()
    gamma_g: tuple
    h: tuple  # device G2 affine ()
    beta_h: tuple


@dataclasses.dataclass
class Commitment:
    """A single G1 point (kzg10/data_structures.rs:325-328); host ints for
    transcript absorption + device affine for verifier math."""

    point: tuple  # (x_int, y_int, inf_bool)

    def to_device(self):
        return C.affine_from_ints(G1, [self.point])

    def absorb_ints(self):
        x, y, inf = self.point
        return [x % SPEC.modulus, y % SPEC.modulus, int(inf)]


@dataclasses.dataclass
class Randomness:
    """Hiding blinding polynomial (kzg10/data_structures.rs:400-436)."""

    blinding_polynomial: Optional[jnp.ndarray] = None  # (hb+2, L) or None

    def is_hiding(self):
        return self.blinding_polynomial is not None


@dataclasses.dataclass
class Proof:
    w: tuple  # (x_int, y_int, inf_bool)
    random_v: Optional[int] = None


def _to_host(pt_proj, ctx: CurveCtx = CTX_BLS12_381) -> tuple:
    from ..core.serialize import device_point_to_ints

    return device_point_to_ints(ctx.g1, pt_proj)


def _srs_msm(coeffs_mont: jnp.ndarray, key, ctx: CurveCtx = CTX_BLS12_381) -> tuple:
    """SRS-sized MSM: the universal hot call (kzg10/mod.rs:175,199,255,270).

    Single-chip by default; when a mesh context is active
    (``parallel.mesh.use_mesh``) the bases+scalars are sharded over the mesh
    axis and per-device Pippenger partials are combined with collectives —
    the TPU replacement for the rayon pool inside arkworks' msm_bigint
    (kzg10/mod.rs:465, SURVEY.md §2.5 TP row).
    """
    from ..parallel import mesh as PM

    active = PM.active_mesh()
    if active is None:
        return M.msm_mont(ctx.g1, coeffs_mont, key, assume_distinct=True)
    mesh, axis = active
    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    sc = F.from_mont(ctx.spec, coeffs_mont)
    sc, pts = PM.pad_msm_inputs(ctx.g1, sc, key, n_dev)
    return PM.msm_sharded(ctx.g1, sc, pts, mesh, axis=axis, assume_distinct=True)


@traced("KZG10::setup")
def setup(max_degree: int, produce_g2_powers: bool = False,
          rng: HostRng | None = None,
          ctx: CurveCtx = CTX_BLS12_381) -> UniversalParams:
    """Sample beta, g, gamma_g, h and build power tables (kzg10/mod.rs:53-124)."""
    g1, g2, spec = ctx.g1, ctx.g2, ctx.spec
    if max_degree < 1:
        raise errors.DegreeIsZero()
    rng = rng or HostRng(0)
    beta = rng.field_int(spec)
    g_k = rng.field_int(spec)
    gamma = rng.field_int(spec)
    h_k = rng.field_int(spec)

    g = C.scalar_mul_int(g1, g1.generator(), g_k)
    h = C.scalar_mul_int(g2, g2.generator(), h_k)

    # powers of beta as plain scalars (host ints; serial like mod.rs:68-73)
    pows = [1] * (max_degree + 2)
    for i in range(1, max_degree + 2):
        pows[i] = pows[i - 1] * beta % spec.modulus
    sc_g = M.scalars_from_ints(spec, pows[: max_degree + 1])
    sc_gg = M.scalars_from_ints(
        spec, [x * gamma % spec.modulus for x in pows[: max_degree + 2]]
    )
    powers_of_g = g1.to_affine(M.fixed_base_mul(g1, g, sc_g))
    powers_of_gamma_g = g1.to_affine(M.fixed_base_mul(g1, g, sc_gg))

    beta_h = C.scalar_mul_int(g2, h, beta)
    neg = None
    if produce_g2_powers:
        # neg_powers_of_h[i] = beta^{-i} h (kzg10/mod.rs:90-104)
        binv = pow(beta, -1, spec.modulus)
        npows = [1] * (max_degree + 1)
        for i in range(1, max_degree + 1):
            npows[i] = npows[i - 1] * binv % spec.modulus
        neg = g2.to_affine(
            M.fixed_base_mul(g2, h, M.scalars_from_ints(spec, npows))
        )

    def aff(pt):
        x, y, inf = g2.to_affine(pt)
        return (x, y, inf)

    return UniversalParams(
        powers_of_g=powers_of_g,
        powers_of_gamma_g=powers_of_gamma_g,
        h=aff(h),
        beta_h=aff(beta_h),
        neg_powers_of_h=neg,
        max_degree=max_degree,
    )


def trim_powers(pp: UniversalParams, supported_degree: int) -> Powers:
    """Plain slice of the SRS (the test-only helper at kzg10/mod.rs:488-517)."""
    take = lambda t, n: tuple(a[:n] for a in t)
    return Powers(
        powers_of_g=take(pp.powers_of_g, supported_degree + 1),
        powers_of_gamma_g=take(pp.powers_of_gamma_g, supported_degree + 2),
    )


def vk_from_params(pp: UniversalParams) -> VerifierKey:
    def first(t):
        x, y, inf = t
        return (x[0], y[0], inf[0])

    return VerifierKey(
        g=first(pp.powers_of_g),
        gamma_g=first(pp.powers_of_gamma_g),
        h=pp.h,
        beta_h=pp.beta_h,
    )


def check_degree_is_too_large(degree: int, num_powers: int):
    """kzg10/mod.rs:424-449 guard."""
    if degree + 1 > num_powers:
        raise errors.TooManyCoefficients(degree + 1, num_powers)


def _divide_auto(spec, coeffs, z_dev, z_int):
    """Witness division: the log-depth host-point formulation on TPU at
    real sizes (the sequential Ruffini scan costs ~80 us/step there —
    division-bound KZG opens, see core/poly.py::divide_by_linear_int);
    the scan elsewhere (compile-light, host-EC-friendly)."""
    import jax

    if jax.default_backend() == "tpu" and coeffs.shape[0] >= 1024:
        return P.divide_by_linear_int(spec, coeffs, z_int)
    return P.divide_by_linear(spec, coeffs, z_dev)


def _pad_to(coeffs: jnp.ndarray, n: int) -> jnp.ndarray:
    """Zero-pad coefficients to length n so MSM shapes stay fixed per key
    (one XLA compilation regardless of polynomial degree)."""
    if coeffs.shape[0] < n:
        coeffs = jnp.pad(coeffs, [(0, n - coeffs.shape[0]), (0, 0)])
    return coeffs


@traced("KZG10::commit")
def commit(powers: Powers, coeffs: jnp.ndarray, hiding_bound: Optional[int] = None,
           rng: HostRng | None = None, ctx: CurveCtx = CTX_BLS12_381):
    """Commit to Montgomery coefficient array (D+1, L) (kzg10/mod.rs:157-210).

    Returns (Commitment, Randomness).
    """
    spec = ctx.spec
    check_degree_is_too_large(coeffs.shape[0] - 1, powers.size())
    pt = _srs_msm(_pad_to(coeffs, powers.size()), powers.powers_of_g, ctx)
    rand = Randomness()
    if hiding_bound is not None:
        if rng is None:
            raise errors.MissingRng()
        if hiding_bound == 0:
            raise errors.HidingBoundIsZero()
        # blinding poly of degree hiding_bound + 1 (mod.rs:181-206)
        n_blind = hiding_bound + 2
        if n_blind > int(powers.powers_of_gamma_g[0].shape[0]):
            raise errors.HidingBoundToolarge(hiding_bound + 1,
                                             int(powers.powers_of_gamma_g[0].shape[0]))
        ints = rng.field_ints(spec, n_blind)
        if ints[-1] % spec.modulus == 0:
            ints[-1] = 1  # keep the blinding degree exact
        blind = F.from_ints(spec, ints)
        rand = Randomness(blinding_polynomial=blind)
        ng = int(powers.powers_of_gamma_g[0].shape[0])
        hpt = _srs_msm(_pad_to(blind, ng), powers.powers_of_gamma_g, ctx)
        pt = ctx.g1.add(pt, hpt)
    return Commitment(point=_to_host(pt, ctx)), rand


@traced("KZG10::open")
def open(powers: Powers, coeffs: jnp.ndarray, point_int: int, rand: Randomness,
         ctx: CurveCtx = CTX_BLS12_381) -> Proof:
    """Single-poly opening proof at a point (kzg10/mod.rs:243-310)."""
    spec = ctx.spec
    check_degree_is_too_large(coeffs.shape[0] - 1, powers.size())
    z = F.from_ints(spec, point_int)
    witness, _ = _divide_auto(spec, coeffs, z, point_int)
    if witness.shape[0] == 0:
        w_pt = ctx.g1.infinity(())
    else:
        w_pt = _srs_msm(_pad_to(witness, powers.size()), powers.powers_of_g, ctx)
    random_v = None
    if rand.is_hiding():
        blind = rand.blinding_polynomial
        bw, brem = P.divide_by_linear(spec, blind, z)
        random_v = F.to_ints(spec, brem)
        if bw.shape[0] > 0:
            ng = int(powers.powers_of_gamma_g[0].shape[0])
            hw = _srs_msm(_pad_to(bw, ng), powers.powers_of_gamma_g, ctx)
            w_pt = ctx.g1.add(w_pt, hw)
    return Proof(w=_to_host(w_pt, ctx), random_v=random_v)


@traced("KZG10::check")
def check(vk: VerifierKey, comm: Commitment, point_int: int, value_int: int,
          proof: Proof, ctx: CurveCtx = CTX_BLS12_381) -> bool:
    """e(C - v g - rv gamma_g + z w, h) * e(-w, beta_h) == 1
    (kzg10/mod.rs:314-333, rearranged like the reference so BOTH G2 points
    are the fixed vk elements and their Miller-loop line coefficients are
    precomputed once per key — PreparedVerifierKey,
    kzg10/data_structures.rs:285-312).

    Verifier-side: a handful of points, host-int EC math + host pairing
    (device pairing kernels on TPU for 381 via the ctx dispatch)."""
    hg1 = ctx.hg1
    from ..core import hostec

    c_h = hostec.triple_to_host(comm.point)
    adj = hg1.sub(c_h, hg1.mul(hostec.triple_to_host(_vk_host(vk, "g", ctx)), value_int))
    if proof.random_v is not None:
        adj = hg1.sub(
            adj, hg1.mul(hostec.triple_to_host(_vk_host(vk, "gamma_g", ctx)), proof.random_v)
        )
    w = hostec.triple_to_host(proof.w)
    adj = hg1.add(adj, hg1.mul(w, point_int) if w else None)
    return ctx.pairing_product_is_one(
        [hostec.host_to_triple(adj), hostec.host_to_triple(hg1.neg(w) if w else None)],
        [_vk_host(vk, "h", ctx), _vk_host(vk, "beta_h", ctx)],
        prepared=[_vk_prepared(vk, "h", ctx), _vk_prepared(vk, "beta_h", ctx)],
    )


@traced("KZG10::batch_check")
def batch_check(vk: VerifierKey, comms, points, values, proofs, rng: HostRng,
                ctx: CurveCtx = CTX_BLS12_381) -> bool:
    """RLC of n openings into one 2-pairing check (kzg10/mod.rs:337-391)."""
    g1, spec = ctx.g1, ctx.spec
    n = len(comms)
    rs = [1] + [rng.u128() for _ in range(n - 1)]
    # total_c = sum r_i (c_i + z_i w_i - v_i g - rv_i gamma_g); total_w = sum r_i w_i
    g_mult = 0
    gg_mult = 0
    c_pts, c_sc, w_pts, w_sc = [], [], [], []
    for r, cm, z, v, pf in zip(rs, comms, points, values, proofs):
        c_pts.append(cm.point)
        c_sc.append(r)
        w_pts.append(pf.w)
        c_pts.append(pf.w)
        c_sc.append(r * z % spec.modulus)
        w_sc.append(r)
        g_mult = (g_mult + r * v) % spec.modulus
        if pf.random_v is not None:
            gg_mult = (gg_mult + r * pf.random_v) % spec.modulus
    ga = C.affine_from_ints(g1, [_vk_host(vk, "g", ctx)])
    gga = C.affine_from_ints(g1, [_vk_host(vk, "gamma_g", ctx)])
    c_pts_d = C.affine_from_ints(g1, c_pts)
    total_c = M.msm(g1, M.scalars_from_ints(spec, c_sc), c_pts_d)
    total_c = g1.add(
        total_c, g1.neg(C.scalar_mul_int(g1, _first(ga, g1), g_mult))
    )
    total_c = g1.add(
        total_c, g1.neg(C.scalar_mul_int(g1, _first(gga, g1), gg_mult))
    )
    w_pts_d = C.affine_from_ints(g1, w_pts)
    total_w = M.msm(g1, M.scalars_from_ints(spec, w_sc), w_pts_d)
    from ..core.serialize import device_point_to_ints

    return ctx.pairing_product_is_one(
        [device_point_to_ints(g1, total_c),
         device_point_to_ints(g1, g1.neg(total_w))],
        [_vk_host(vk, "h", ctx), _vk_host(vk, "beta_h", ctx)],
        prepared=[_vk_prepared(vk, "h", ctx), _vk_prepared(vk, "beta_h", ctx)],
    )


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------


def _first(aff_batch, group=None):
    group = group or G1
    x, y, inf = aff_batch
    return group.from_affine(x[0], y[0], inf[0])


def _vk_prepared(vk, name: str, ctx: CurveCtx = CTX_BLS12_381):
    """Cached G2 line-coefficient precomputation for a vk element — the
    PreparedVerifierKey analogue (kzg10/data_structures.rs:285-312).
    Derived, never persisted: rebuilt on first use after load, matching the
    reference's recompute-on-deserialize split (data_structures.rs:95-96)."""
    cache = getattr(vk, "_prep_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(vk, "_prep_cache", cache)
    if name not in cache:
        cache[name] = ctx.prepare_g2(_vk_host(vk, name, ctx))
    return cache[name]


def _vk_host(vk, name: str, ctx: CurveCtx = CTX_BLS12_381):
    """VerifierKey device point -> host int triple (cached on the vk)."""
    cache = getattr(vk, "_host_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(vk, "_host_cache", cache)
    if name not in cache:
        from ..core.serialize import device_point_to_ints

        grp = ctx.g1 if name in ("g", "gamma_g") else ctx.g2
        x, y, inf = getattr(vk, name)
        cache[name] = device_point_to_ints(grp, grp.from_affine(x, y, inf))
    return cache[name]


def pairing_backend() -> str:
    """'device' (core/pairing.py kernels) or 'host' (core/host_pairing.py).

    The pairing is O(1)/latency-bound; on CPU hosts exact big-int math beats
    emulated-limb XLA by orders of magnitude, so default host off-TPU.
    Override with POLY_COMMIT_PAIRING={host,device}.
    """
    import os

    env = os.environ.get("POLY_COMMIT_PAIRING")
    if env in ("host", "device"):
        return env
    import jax

    return "device" if jax.default_backend() == "tpu" else "host"


def pairing_product_is_one_host(g1_triples, g2_triples) -> bool:
    """prod e(P_i, Q_i) == 1 from host int triples; dispatches backends."""
    if pairing_backend() == "host":
        from ..core import host_pairing as HP

        return HP.pairing_product_is_one(g1_triples, g2_triples)
    p_aff = C.affine_from_ints(G1, g1_triples)
    q_aff = C.affine_from_ints(G2, g2_triples)
    return pairing_check_padded(p_aff, q_aff)


def pairing_check_padded(p_aff, q_aff, multiple: int = 4) -> bool:
    """pairing_check with the pair axis padded to a multiple (infinity pairs
    contribute f = 1) so every scheme shares a handful of compiled programs."""
    n = p_aff[0].shape[0]
    padn = (-n) % multiple
    if padn:
        def padf(a):
            return jnp.concatenate([a, jnp.zeros((padn,) + a.shape[1:], a.dtype)], 0)

        def pad_pt(t):
            x, y, inf = t
            inf = jnp.concatenate([inf, jnp.ones((padn,), bool)], 0)
            return (padf(x), padf(y), inf)

        p_aff = pad_pt(p_aff)
        q_aff = pad_pt(q_aff)
    return bool(np.asarray(PR.pairing_check(p_aff, q_aff)))
