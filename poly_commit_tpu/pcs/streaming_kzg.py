"""Streaming KZG (Gemini): time prover + bounded-memory chunked prover,
multi-point openings via vanishing polynomials, and the folded-polynomial
tree.

Re-design of /root/reference/poly-commit/src/streaming_kzg/:
  CommitterKey::new / commit / open / open_multi_points /
  batch_open_multi_points         time.rs:44-152
  VerifierKey::verify             mod.rs:172-189
  VerifierKey::verify_multi_points  mod.rs:197-261
  vanishing_polynomial / linear_combination / powers  mod.rs:279-311
  space prover (streams + ChunkedPippenger)           space.rs:29-136
  FoldedPolynomialTree            data_structures.rs:12-138

TPU re-interpretation of the space prover: the coefficient stream becomes a
sequence of fixed-size device chunks; commit accumulates one MSM partial per
chunk (== ChunkedPippenger with a device-resident buffer), and the folded
tree is computed as log-n fold kernels in one pass over the coefficients —
chunked and plain provers must produce identical group elements (mirrored
from the reference's time/space consistency tests, streaming_kzg/tests.rs).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core import curve as C
from ..core import field as F
from ..core import hostec
from ..core import msm as M
from ..core import poly as P
from ..core.curve import BLS12_381_G1, BLS12_381_G2
from ..core.field_params import FR_BLS12_381
from ..core.serialize import device_point_to_ints, device_points_to_ints
from . import errors
from .data_structures import HostRng
from .kzg10 import pairing_product_is_one_host

G1 = BLS12_381_G1
G2 = BLS12_381_G2
SPEC = FR_BLS12_381
HG1 = hostec.host_group(G1)


@dataclasses.dataclass
class Commitment:
    point: tuple  # host (x, y, inf)


@dataclasses.dataclass
class EvaluationProof:
    point: tuple


@dataclasses.dataclass
class VerifierKey:
    """mod.rs:160-166: G1 powers up to max_eval_points, G2 powers."""

    powers_of_g: tuple  # device affine (max_eval_points,)
    powers_of_g2: list  # host G2 triples (max_eval_points+1)


@dataclasses.dataclass
class CommitterKey:
    """time.rs:19-63."""

    powers_of_g: tuple  # device affine (max_degree+1,)
    powers_of_g2: list  # host G2 triples (max_eval_points+1)

    @classmethod
    def new(cls, max_degree: int, max_eval_points: int, rng: HostRng | None = None):
        rng = rng or HostRng(0)
        tau = rng.field_int(SPEC)
        g_k = rng.field_int(SPEC)
        g2_k = rng.field_int(SPEC)
        g = C.scalar_mul_int(G1, G1.generator(), g_k)
        g2 = C.scalar_mul_int(G2, G2.generator(), g2_k)
        pows = [1] * (max_degree + 1)
        for i in range(1, max_degree + 1):
            pows[i] = pows[i - 1] * tau % SPEC.modulus
        powers_of_g = G1.to_affine(
            M.fixed_base_mul(G1, g, M.scalars_from_ints(SPEC, pows))
        )
        g2pows = pows[: max_eval_points + 1]
        g2_pts = G2.to_affine(
            M.fixed_base_mul(G2, g2, M.scalars_from_ints(SPEC, g2pows))
        )
        powers_of_g2 = device_points_to_ints(G2, G2.from_affine(*g2_pts))
        return cls(powers_of_g=powers_of_g, powers_of_g2=powers_of_g2)

    def max_eval_points(self) -> int:
        return len(self.powers_of_g2) - 1

    def verifier_key(self) -> VerifierKey:
        n = self.max_eval_points()
        return VerifierKey(
            powers_of_g=tuple(a[:n] for a in self.powers_of_g),
            powers_of_g2=self.powers_of_g2,
        )

    # -- commitments -----------------------------------------------------
    def commit(self, coeffs: jnp.ndarray) -> Commitment:
        """coeffs (D+1, L) Montgomery (time.rs:72-74)."""
        c = _pad(coeffs, int(self.powers_of_g[0].shape[0]))
        pt = M.msm_mont(G1, c, self.powers_of_g, assume_distinct=True)
        return Commitment(device_point_to_ints(G1, pt))

    def batch_commit(self, polys) -> list:
        return [self.commit(p) for p in polys]

    def commit_chunked(self, coeffs: jnp.ndarray, chunk: int) -> Commitment:
        """Bounded-memory commit: per-chunk MSM partials accumulated on
        device (the ChunkedPippenger analogue, space.rs:65-95)."""
        n = coeffs.shape[0]
        acc = G1.infinity(())
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            seg = _pad(coeffs[s:e], chunk)
            key = tuple(a[s : s + chunk] for a in _pad_key(self.powers_of_g, s + chunk))
            acc = G1.add(acc, M.msm_mont(G1, seg, key, assume_distinct=True))
        return Commitment(device_point_to_ints(G1, acc))

    # -- openings ----------------------------------------------------------
    def open(self, coeffs: jnp.ndarray, point: int):
        """Ruffini division scan (time.rs:104-123). Returns (eval, proof)."""
        z = F.from_ints(SPEC, int(point) % SPEC.modulus)
        quotient, rem = P.divide_by_linear(SPEC, coeffs, z)
        evaluation = int(F.to_ints(SPEC, rem))
        if quotient.shape[0] == 0:
            w = G1.infinity(())
        else:
            w = M.msm_mont(
                G1,
                _pad(quotient, int(self.powers_of_g[0].shape[0])),
                self.powers_of_g,
                assume_distinct=True,
            )
        return evaluation, EvaluationProof(device_point_to_ints(G1, w))

    def open_multi_points(self, coeffs: jnp.ndarray, eval_points) -> EvaluationProof:
        """Divide by the vanishing polynomial (time.rs:126-137)."""
        pts = F.from_ints(SPEC, [int(z) % SPEC.modulus for z in eval_points])
        z_poly = P.vanishing_poly(SPEC, pts)
        q, _ = P.long_divide(SPEC, coeffs, z_poly)
        return EvaluationProof(self.commit(q).point)

    def batch_open_multi_points(self, polys, eval_points, eval_chal: int):
        """RLC by eta powers then one multi-point open (time.rs:141-152)."""
        assert len(eval_points) < len(self.powers_of_g2)
        etas = _powers_int(eval_chal, len(polys))
        comb = None
        for p, eta in zip(polys, etas):
            scaled = P.scale(SPEC, p, F.from_ints(SPEC, eta))
            comb = scaled if comb is None else P.add(SPEC, comb, scaled)
        return self.open_multi_points(comb, eval_points)

    # -- Gemini folded tree (data_structures.rs:12-138, space.rs:165-262) --
    def fold_polynomials(self, coeffs: jnp.ndarray, challenges) -> list:
        """All log-n foldings f^(j+1)(x) = f^(j)_even + rho_j f^(j)_odd,
        one pass over the coefficients."""
        out = []
        cur = coeffs
        for rho in challenges:
            n = cur.shape[0]
            if n % 2:
                cur = jnp.pad(cur, ((0, 1), (0, 0)))
                n += 1
            ev = cur[0::2]
            od = cur[1::2]
            rf = F.from_ints(SPEC, int(rho) % SPEC.modulus)
            cur = F.add(SPEC, ev, F.mont_mul(SPEC, od, jnp.broadcast_to(rf, od.shape)))
            out.append(cur)
        return out

    def commit_folding(self, coeffs: jnp.ndarray, challenges) -> list:
        """Commitments to every folded polynomial (space.rs:165-207)."""
        return [self.commit(f) for f in self.fold_polynomials(coeffs, challenges)]


def _pad(coeffs: jnp.ndarray, n: int) -> jnp.ndarray:
    if coeffs.shape[0] < n:
        return jnp.pad(coeffs, ((0, n - coeffs.shape[0]), (0, 0)))
    return coeffs


def _pad_key(key, n):
    if int(key[0].shape[0]) >= n:
        return key
    padn = n - int(key[0].shape[0])

    def padf(a):
        pad = [(0, padn)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad, constant_values=0)

    x, y, inf = key
    return (padf(x), padf(y), jnp.pad(inf, [(0, padn)], constant_values=True))


def _powers_int(x: int, n: int) -> list:
    p = SPEC.modulus
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * x % p
    return out


# ---------------------------------------------------------------------------
# verification (mod.rs:172-261)
# ---------------------------------------------------------------------------


def verify(vk: VerifierKey, commitment: Commitment, alpha: int, evaluation: int,
           proof: EvaluationProof) -> bool:
    """e(C - v g, g2) == e(W, g2^(tau - alpha))."""
    p_mod = SPEC.modulus
    alpha = int(alpha) % p_mod
    g2_0 = vk.powers_of_g2[0]
    g2_1 = vk.powers_of_g2[1]
    # ep = g2^(tau) - alpha * g2 on host G2
    hg2 = hostec.host_group(G2)
    ep = hg2.sub(
        hostec.triple_to_host(g2_1),
        hg2.mul(hostec.triple_to_host(g2_0), alpha),
    )
    g_host = _g_host(vk)
    lhs = HG1.sub(
        hostec.triple_to_host(commitment.point),
        HG1.mul(g_host, int(evaluation) % p_mod),
    )
    g1s = [hostec.host_to_triple(lhs),
           hostec.host_to_triple(HG1.neg(hostec.triple_to_host(proof.point)))]
    g2s = [g2_0, hostec.host_to_triple(ep, fq2=True)]
    return pairing_product_is_one_host(g1s, g2s)


def verify_multi_points(vk: VerifierKey, commitments, eval_points, evaluations,
                        proof: EvaluationProof, open_chal: int) -> bool:
    """mod.rs:197-261: interpolate claimed evals, pair against the vanishing
    polynomial in G2."""
    p_mod = SPEC.modulus
    pts_dev = F.from_ints(SPEC, [int(z) % p_mod for z in eval_points])
    z_poly = P.vanishing_poly(SPEC, pts_dev)  # (m+1, L)
    # zeros = MSM(powers_of_g2, z_poly) on host (m+1 points)
    hg2 = hostec.host_group(G2)
    z_ints = F.to_ints(SPEC, z_poly)
    zeros = None
    for zi, g2i in zip(z_ints, vk.powers_of_g2):
        zeros = hg2.add(zeros, hg2.mul(hostec.triple_to_host(g2i), int(zi)))
    # interpolated polynomial combined with eta powers
    etas = _powers_int(int(open_chal) % p_mod, len(evaluations))
    comb = None
    for evals, eta in zip(evaluations, etas):
        ys = F.from_ints(SPEC, [int(v) % p_mod for v in evals])
        ipoly = P.lagrange_interpolate(SPEC, pts_dev, ys)
        scaled = P.scale(SPEC, ipoly, F.from_ints(SPEC, eta))
        comb = scaled if comb is None else P.add(SPEC, comb, scaled)
    i_comm = M.msm_mont(
        G1, _pad(comb, int(vk.powers_of_g[0].shape[0])), vk.powers_of_g
    )
    i_host = hostec.triple_to_host(device_point_to_ints(G1, i_comm))
    f_comm = None
    for cm, eta in zip(commitments, etas):
        f_comm = HG1.add(f_comm, HG1.mul(hostec.triple_to_host(cm.point), eta))
    lhs = HG1.sub(f_comm, i_host)
    g1s = [hostec.host_to_triple(lhs),
           hostec.host_to_triple(HG1.neg(hostec.triple_to_host(proof.point)))]
    g2s = [vk.powers_of_g2[0], hostec.host_to_triple(zeros, fq2=True)]
    return pairing_product_is_one_host(g1s, g2s)


def _g_host(vk: VerifierKey):
    x, y, inf = vk.powers_of_g
    return hostec.triple_to_host(
        device_points_to_ints(G1, G1.from_affine(x[:1], y[:1], inf[:1]))[0]
    )
