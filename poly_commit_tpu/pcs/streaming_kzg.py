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
import functools

import jax
import jax.numpy as jnp
import numpy as np

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
from ..utils.trace import traced

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
    @traced("StreamingKZG::commit")
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
    @traced("StreamingKZG::open")
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

    @traced("StreamingKZG::open_multi_points")
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

    # -- bounded-memory (space) opens ------------------------------------
    # TPU re-interpretation of streaming_kzg/space.rs:65-136: the reference
    # walks reversed coefficient streams one scalar at a time with a
    # ChunkedPippenger buffer; here the stream becomes fixed-size device
    # chunks processed high->low, the per-element recurrences become ONE
    # lax.scan per chunk, and the carried state is O(m) field elements +
    # one projective accumulator. Results are group-identical to the time
    # prover (the reference's time/space consistency contract, tests.rs:40-83).

    def open_chunked(self, coeffs: jnp.ndarray, point: int, chunk: int):
        """Bounded-memory single-point open (space.rs:65-95).

        Processes (D+1) coefficients in chunks from the highest degree down;
        each chunk's Ruffini segment is the chunk polynomial plus the carried
        accumulator as its top coefficient. Returns (evaluation, proof)."""
        z = F.from_ints(SPEC, int(point) % SPEC.modulus)
        n = coeffs.shape[0]
        acc = G1.infinity(())
        carry = jnp.zeros((1, SPEC.n_limbs), jnp.uint32)
        for s in reversed(range(0, n, chunk)):
            e = min(s + chunk, n)
            arr = jnp.concatenate([coeffs[s:e], carry], axis=0)
            w, rem = P.divide_by_linear(SPEC, arr, z)
            carry = rem[None]
            # w[k] is the global quotient coefficient q_{s+k} (the top
            # chunk's final w is the zero carry slot - pairs with key[n-1])
            key = tuple(a[s:e] for a in self.powers_of_g)
            acc = G1.add(acc, M.msm_mont(G1, w, key, assume_distinct=True))
        evaluation = int(F.to_ints(SPEC, carry[0]))
        return evaluation, EvaluationProof(device_point_to_ints(G1, acc))

    def open_multi_points_chunked(self, coeffs: jnp.ndarray, eval_points,
                                  chunk: int):
        """Bounded-memory multi-point open (space.rs:98-136): long division
        by the vanishing polynomial with an m-deep carried remainder window
        (the VecDeque state). Returns (remainder (m, L) ascending, proof);
        the proof equals the time prover's ``open_multi_points``."""
        p_mod = SPEC.modulus
        pts = F.from_ints(SPEC, [int(v) % p_mod for v in eval_points])
        m = pts.shape[0]
        n = coeffs.shape[0]
        assert n > m, "polynomial must outdegree the vanishing polynomial"
        zpoly = P.vanishing_poly(SPEC, pts)  # (m+1, L), monic
        zrev = jnp.flip(zpoly[:m], axis=0)  # low coeffs, descending degree
        delta = jnp.zeros((m, SPEC.n_limbs), jnp.uint32)
        acc = G1.infinity(())
        rem_desc = []  # adjusted coefficients at degrees m-1..0
        for s in reversed(range(0, n, chunk)):
            e = min(s + chunk, n)
            seg_desc = jnp.flip(coeffs[s:e], axis=0)
            degs = np.arange(e - 1, s - 1, -1)
            emit = jnp.asarray(degs >= m)
            delta, q_desc, cur_desc = _stream_long_div_chunk(
                SPEC, zrev, delta, seg_desc, emit
            )
            lo, hi = max(0, s - m), max(0, e - m)
            if hi > lo:
                q_asc = jnp.flip(q_desc, axis=0)  # degrees s-m .. e-1-m
                off = lo - (s - m)
                key = tuple(a[lo:hi] for a in self.powers_of_g)
                acc = G1.add(
                    acc,
                    M.msm_mont(G1, q_asc[off : off + (hi - lo)], key,
                               assume_distinct=True),
                )
            take = (degs < m).nonzero()[0]
            if take.size:
                rem_desc.append(cur_desc[take.min() : take.max() + 1])
        remainder = jnp.flip(jnp.concatenate(rem_desc, axis=0), axis=0)
        return remainder, EvaluationProof(device_point_to_ints(G1, acc))

    def open_folding_chunked(self, coeffs: jnp.ndarray, challenges,
                             eval_points, etas, chunk: int):
        """Bounded-memory fold-and-open (space.rs:209-262): one pass over the
        coefficient chunks computes every folded polynomial f^(j) locally
        (chunk boundaries are multiples of 2^depth, so each level's piece is
        contiguous), runs the per-level vanishing-poly division with carried
        windows, and accumulates ONE eta-combined proof.

        Returns ([remainder_j (m, L)], proof) with remainder_j = f^(j) mod Z
        (so f^(j)'s claimed evaluations come from evaluating remainder_j)."""
        p_mod = SPEC.modulus
        depth = len(challenges)
        assert chunk % (1 << depth) == 0 and chunk >= (1 << depth)
        pts = F.from_ints(SPEC, [int(v) % p_mod for v in eval_points])
        m = pts.shape[0]
        n = coeffs.shape[0]
        assert n % (1 << depth) == 0
        zpoly = P.vanishing_poly(SPEC, pts)
        zrev = jnp.flip(zpoly[:m], axis=0)
        rhos = [F.from_ints(SPEC, int(r) % p_mod) for r in challenges]
        eta_f = [F.from_ints(SPEC, int(t) % p_mod) for t in etas]
        deltas = [jnp.zeros((m, SPEC.n_limbs), jnp.uint32) for _ in range(depth)]
        rem_desc = [[] for _ in range(depth)]
        acc = G1.infinity(())
        for s in reversed(range(0, n, chunk)):
            e = min(s + chunk, n)
            seg = coeffs[s:e]
            for j in range(1, depth + 1):
                # local fold: f^(j) piece over degrees [s/2^j, e/2^j)
                half = seg.reshape(-1, 2, SPEC.n_limbs)
                seg = F.add(
                    SPEC,
                    half[:, 0],
                    F.mont_mul(
                        SPEC, half[:, 1],
                        jnp.broadcast_to(rhos[j - 1], half[:, 1].shape),
                    ),
                )
                lvl_n = n >> j
                assert lvl_n > m, "folded polynomial shorter than Z"
                ls, le = s >> j, e >> j
                seg_desc = jnp.flip(seg, axis=0)
                degs = np.arange(le - 1, ls - 1, -1)
                emit = jnp.asarray(degs >= m)
                deltas[j - 1], q_desc, cur_desc = _stream_long_div_chunk(
                    SPEC, zrev, deltas[j - 1], seg_desc, emit
                )
                lo, hi = max(0, ls - m), max(0, le - m)
                if hi > lo:
                    q_asc = jnp.flip(q_desc, axis=0)
                    off = lo - (ls - m)
                    qs = q_asc[off : off + (hi - lo)]
                    qs = F.mont_mul(
                        SPEC, qs, jnp.broadcast_to(eta_f[j - 1], qs.shape)
                    )
                    key = tuple(a[lo:hi] for a in self.powers_of_g)
                    acc = G1.add(
                        acc, M.msm_mont(G1, qs, key, assume_distinct=True)
                    )
                take = (degs < m).nonzero()[0]
                if take.size:
                    rem_desc[j - 1].append(cur_desc[take.min() : take.max() + 1])
        remainders = [
            jnp.flip(jnp.concatenate(r, axis=0), axis=0) for r in rem_desc
        ]
        return remainders, EvaluationProof(device_point_to_ints(G1, acc))

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


@functools.partial(jax.jit, static_argnums=0)
def _stream_long_div_chunk(spec, zrev, delta, seg_desc, emit):
    """One chunk of streaming long division by a monic divisor Z (degree m).

    The reference's per-coefficient VecDeque loop (space.rs:115-133) as one
    lax.scan. seg_desc: (C, L) original coefficients, DESCENDING degree.
    delta: (m, L) carried adjustments, delta[k] applying to the coefficient
    arriving k steps from now. emit: (C,) bool, True while the current
    degree >= m (a quotient coefficient is produced and Z is subtracted).

    Returns (delta', q_desc, cur_desc): q_desc[k] is the quotient coefficient
    of degree (deg_k - m) when emit[k] (else 0); cur_desc[k] is the adjusted
    coefficient (the remainder coefficient once deg_k < m).
    """

    def body(delta, inp):
        c_in, em = inp
        cur = F.add(spec, c_in, delta[0])
        shifted = jnp.concatenate(
            [delta[1:], jnp.zeros((1, spec.n_limbs), jnp.uint32)], axis=0
        )
        subbed = F.sub(
            spec, shifted, F.mont_mul(spec, zrev, jnp.broadcast_to(cur, zrev.shape))
        )
        delta = jnp.where(em, subbed, shifted)
        q = jnp.where(em, cur, jnp.zeros_like(cur))
        return delta, (q, cur)

    delta, (qs, curs) = jax.lax.scan(body, delta, (seg_desc, emit))
    return delta, qs, curs


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
