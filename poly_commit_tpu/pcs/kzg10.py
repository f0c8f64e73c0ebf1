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
from .data_structures import HostRng

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


def _to_host(pt_proj) -> tuple:
    from ..core.serialize import device_point_to_ints

    return device_point_to_ints(G1, pt_proj)


def setup(max_degree: int, produce_g2_powers: bool = False, rng: HostRng | None = None) -> UniversalParams:
    """Sample beta, g, gamma_g, h and build power tables (kzg10/mod.rs:53-124)."""
    if max_degree < 1:
        raise errors.DegreeIsZero()
    rng = rng or HostRng(0)
    beta = rng.field_int(SPEC)
    g_k = rng.field_int(SPEC)
    gamma = rng.field_int(SPEC)
    h_k = rng.field_int(SPEC)

    g = C.scalar_mul_int(G1, G1.generator(), g_k)
    h = C.scalar_mul_int(G2, G2.generator(), h_k)

    # powers of beta as plain scalars (host ints; serial like mod.rs:68-73)
    pows = [1] * (max_degree + 2)
    for i in range(1, max_degree + 2):
        pows[i] = pows[i - 1] * beta % SPEC.modulus
    sc_g = M.scalars_from_ints(SPEC, pows[: max_degree + 1])
    sc_gg = M.scalars_from_ints(
        SPEC, [x * gamma % SPEC.modulus for x in pows[: max_degree + 2]]
    )
    powers_of_g = G1.to_affine(M.fixed_base_mul(G1, g, sc_g))
    powers_of_gamma_g = G1.to_affine(M.fixed_base_mul(G1, g, sc_gg))

    beta_h = C.scalar_mul_int(G2, h, beta)
    neg = None
    if produce_g2_powers:
        # neg_powers_of_h[i] = beta^{-i} h (kzg10/mod.rs:90-104)
        binv = pow(beta, -1, SPEC.modulus)
        npows = [1] * (max_degree + 1)
        for i in range(1, max_degree + 1):
            npows[i] = npows[i - 1] * binv % SPEC.modulus
        neg = G2.to_affine(
            M.fixed_base_mul(G2, h, M.scalars_from_ints(SPEC, npows))
        )

    def aff(pt):
        x, y, inf = G2.to_affine(pt)
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


def _pad_to(coeffs: jnp.ndarray, n: int) -> jnp.ndarray:
    """Zero-pad coefficients to length n so MSM shapes stay fixed per key
    (one XLA compilation regardless of polynomial degree)."""
    if coeffs.shape[0] < n:
        coeffs = jnp.pad(coeffs, [(0, n - coeffs.shape[0]), (0, 0)])
    return coeffs


def commit(powers: Powers, coeffs: jnp.ndarray, hiding_bound: Optional[int] = None,
           rng: HostRng | None = None):
    """Commit to Montgomery coefficient array (D+1, L) (kzg10/mod.rs:157-210).

    Returns (Commitment, Randomness).
    """
    check_degree_is_too_large(coeffs.shape[0] - 1, powers.size())
    pt = M.msm_mont(G1, _pad_to(coeffs, powers.size()), powers.powers_of_g,
                    assume_distinct=True)
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
        ints = rng.field_ints(SPEC, n_blind)
        if ints[-1] % SPEC.modulus == 0:
            ints[-1] = 1  # keep the blinding degree exact
        blind = F.from_ints(SPEC, ints)
        rand = Randomness(blinding_polynomial=blind)
        ng = int(powers.powers_of_gamma_g[0].shape[0])
        hpt = M.msm_mont(G1, _pad_to(blind, ng), powers.powers_of_gamma_g,
                         assume_distinct=True)
        pt = G1.add(pt, hpt)
    return Commitment(point=_to_host(pt)), rand


def open(powers: Powers, coeffs: jnp.ndarray, point_int: int, rand: Randomness) -> Proof:
    """Single-poly opening proof at a point (kzg10/mod.rs:243-310)."""
    check_degree_is_too_large(coeffs.shape[0] - 1, powers.size())
    z = F.from_ints(SPEC, point_int)
    witness, _ = P.divide_by_linear(SPEC, coeffs, z)
    if witness.shape[0] == 0:
        w_pt = G1.infinity(())
    else:
        w_pt = M.msm_mont(G1, _pad_to(witness, powers.size()), powers.powers_of_g,
                          assume_distinct=True)
    random_v = None
    if rand.is_hiding():
        blind = rand.blinding_polynomial
        bw, brem = P.divide_by_linear(SPEC, blind, z)
        random_v = F.to_ints(SPEC, brem)
        if bw.shape[0] > 0:
            ng = int(powers.powers_of_gamma_g[0].shape[0])
            hw = M.msm_mont(G1, _pad_to(bw, ng), powers.powers_of_gamma_g,
                            assume_distinct=True)
            w_pt = G1.add(w_pt, hw)
    return Proof(w=_to_host(w_pt), random_v=random_v)


def check(vk: VerifierKey, comm: Commitment, point_int: int, value_int: int,
          proof: Proof) -> bool:
    """e(C - v g - rv gamma_g, h) == e(w, beta_h - z h) (kzg10/mod.rs:314-333)."""
    cpt = _dev_pt(comm.point)
    adj = G1.add(cpt, G1.neg(C.scalar_mul_int(G1, _as_proj(vk.g), value_int)))
    if proof.random_v is not None:
        adj = G1.add(
            adj, G1.neg(C.scalar_mul_int(G1, _as_proj(vk.gamma_g), proof.random_v))
        )
    w = _dev_pt(proof.w)
    # beta_h - z h in G2
    zh = C.scalar_mul_int(G2, _as_proj_g2(vk.h), point_int)
    rhs_g2 = G2.add(_as_proj_g2(vk.beta_h), G2.neg(zh))
    return _pairing_product_is_one([adj, G1.neg(w)], [_as_proj_g2(vk.h), rhs_g2])


def batch_check(vk: VerifierKey, comms, points, values, proofs, rng: HostRng) -> bool:
    """RLC of n openings into one 2-pairing check (kzg10/mod.rs:337-391)."""
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
        c_sc.append(r * z % SPEC.modulus)
        w_sc.append(r)
        g_mult = (g_mult + r * v) % SPEC.modulus
        if pf.random_v is not None:
            gg_mult = (gg_mult + r * pf.random_v) % SPEC.modulus
    ga = C.affine_from_ints(G1, [_host_aff(vk.g)])
    gga = C.affine_from_ints(G1, [_host_aff(vk.gamma_g)])
    c_pts_d = C.affine_from_ints(G1, c_pts)
    total_c = M.msm(G1, M.scalars_from_ints(SPEC, c_sc), c_pts_d)
    total_c = G1.add(
        total_c, G1.neg(C.scalar_mul_int(G1, _first(ga), g_mult))
    )
    total_c = G1.add(
        total_c, G1.neg(C.scalar_mul_int(G1, _first(gga), gg_mult))
    )
    w_pts_d = C.affine_from_ints(G1, w_pts)
    total_w = M.msm(G1, M.scalars_from_ints(SPEC, w_sc), w_pts_d)
    return _pairing_product_is_one(
        [total_c, G1.neg(total_w)], [_as_proj_g2(vk.h), _as_proj_g2(vk.beta_h)]
    )


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------


def _dev_pt(int_triple):
    aff = C.affine_from_ints(G1, [int_triple])
    return _first(aff)


def _first(aff_batch):
    x, y, inf = aff_batch
    return G1.from_affine(x[0], y[0], inf[0])


def _as_proj(aff_single):
    x, y, inf = aff_single
    return G1.from_affine(x, y, inf)


def _as_proj_g2(aff_single):
    x, y, inf = aff_single
    return G2.from_affine(x, y, inf)


def _host_aff(aff_single):
    from ..core.serialize import device_point_to_ints

    return device_point_to_ints(G1, _as_proj(aff_single))


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


def _pairing_product_is_one(g1_projs, g2_projs) -> bool:
    from ..core.serialize import device_point_to_ints

    g1s = [device_point_to_ints(G1, p) for p in g1_projs]
    g2s = [device_point_to_ints(G2, q) for q in g2_projs]
    return pairing_product_is_one_host(g1s, g2s)


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
