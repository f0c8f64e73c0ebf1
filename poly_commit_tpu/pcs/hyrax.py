"""Hyrax multilinear PC (WTsTW17, Fiat-Shamired) over BN254 G1.

Re-design of /root/reference/poly-commit/src/hyrax/mod.rs:
  setup (hash-derived Pedersen key)      mod.rs:119-168
  commit (per-row Pedersen multi-commit) mod.rs:193-255
  open (Sigma dot-product argument)      mod.rs:273-406
  check (eqs (13)/(14) of the paper)     mod.rs:418-511
  flat_to_matrix_column_major/tensors    utils.rs:13-39

TPU mapping: the coefficient matrix lives on device as a (dim, dim, L)
Montgomery array; all row commitments are ONE batched MSM-per-row kernel
(vmap of the Pippenger kernel over rows); tensor products and the matrix-
vector product lt = l^T M are batched field kernels. Transcript on host.

Deliberate divergences from the reference:
  * per-row hiding randomness comes from the caller's seeded HostRng —
    fixing the reference's irreproducible rand::thread_rng() under
    `parallel` (mod.rs:237-238, flagged in SURVEY.md §5.2);
  * like the reference, `check` does NOT read the claimed evaluation values:
    the evaluation is bound by the hiding commitment com_eval inside the
    proof (mod.rs:447 discards `_values`).
"""

from __future__ import annotations

import dataclasses
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..core import curve as C
from ..core import field as F
from ..core import field_params as FP
from ..core import hostec
from ..core import msm as M
from ..core import poly as P
from ..core.serialize import point_to_bytes
from . import errors
from .data_structures import (
    HostRng,
    LabeledCommitment,
    PolynomialCommitment,
)
from ..utils.trace import traced

GROUP = C.BN254_G1
SPEC = FP.FR_BN254
BASE = FP.FQ_BN254
HGROUP = hostec.host_group(GROUP)
PROTOCOL_NAME = b"Hyrax protocol"


def _hash_to_curve(seed: bytes):
    """Candidate x from Blake2s; y = sqrt(x^3 + b) (BN254: p = 3 mod 4)."""
    p = BASE.modulus
    b = FP.BN254_B
    j = 0
    while True:
        h = hashlib.blake2s(seed + j.to_bytes(8, "little")).digest()
        x = int.from_bytes(h, "little") % p
        rhs = (x * x * x + b) % p
        y = pow(rhs, (p + 1) // 4, p)
        if y * y % p == rhs:
            if h[0] & 1:
                y = (p - y) % p
            return (x, y)  # cofactor 1 for BN254 G1
        j += 1


def sample_generators(num: int):
    return [
        _hash_to_curve(PROTOCOL_NAME + i.to_bytes(8, "little")) for i in range(num)
    ]


@dataclasses.dataclass
class UniversalParams:
    """com_key (device affine (dim,)) + hiding generator h; host mirrors for
    transcript absorption (data_structures.rs:14-41)."""

    com_key: tuple
    h: tuple  # host (x, y)
    com_key_host: list  # [(x, y)] for transcript absorption

    @property
    def dim(self):
        return int(self.com_key[0].shape[0])


CommitterKey = UniversalParams
VerifierKey = UniversalParams


@dataclasses.dataclass
class Commitment:
    row_coms: list  # host [(x, y, inf)]


@dataclasses.dataclass
class CommitmentState:
    """Per-row hiding randomness + the coefficient matrix (device)."""

    randomness: jnp.ndarray  # (dim, L) Montgomery
    mat: jnp.ndarray  # (dim, dim, L) Montgomery, mat[r, c]


@dataclasses.dataclass
class HyraxProof:
    com_eval: tuple  # host (x, y, inf)
    com_d: tuple
    com_b: tuple
    z: list  # dim ints
    z_d: int
    z_b: int


def _fsum0(a: jnp.ndarray) -> jnp.ndarray:
    """Field sum over axis 0 (any length)."""
    n = a.shape[0]
    while n > 1:
        half = n // 2
        head = F.add(SPEC, a[:half], a[half : 2 * half])
        a = head if n % 2 == 0 else jnp.concatenate([head, a[n - 1 :]], 0)
        n = (n + 1) // 2
    return a[0]


def _ip(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _fsum0(F.mont_mul(SPEC, a, b))


def _pedersen(key_aff, scalars_mont, h_host=None, rand_int=None):
    """MSM + optional hiding term; returns host (x, y, inf) triple."""
    pt = M.msm_mont(GROUP, scalars_mont, key_aff, assume_distinct=True)
    from ..core.serialize import device_point_to_ints

    host = hostec.triple_to_host(device_point_to_ints(GROUP, pt))
    if rand_int is not None:
        host = HGROUP.add(host, HGROUP.mul(h_host, rand_int))
    return hostec.host_to_triple(host)


def _absorb_point(sponge, triple):
    sponge.absorb_bytes(point_to_bytes(GROUP, triple))


class HyraxPC(PolynomialCommitment):
    spec = SPEC

    @classmethod
    @traced("Hyrax::setup")
    def setup(cls, max_degree=0, num_vars=None, rng=None):
        if num_vars is None or num_vars % 2 == 1:
            raise errors.InvalidNumberOfVariables()
        dim = 1 << (num_vars // 2)
        pts = sample_generators(dim + 1)
        h = pts.pop()
        com_key = C.affine_from_ints(GROUP, [(x, y, False) for (x, y) in pts])
        return UniversalParams(com_key=com_key, h=h, com_key_host=pts)

    @classmethod
    @traced("Hyrax::trim")
    def trim(cls, pp, supported_degree=0, supported_hiding_bound=0,
             enforced_degree_bounds=None):
        return pp, pp

    @classmethod
    def evaluate_poly(cls, labeled_poly, point):
        pt = F.from_ints(SPEC, list(point))
        return int(F.to_ints(SPEC, P.mle_evaluate(SPEC, labeled_poly.poly, pt)))

    @classmethod
    @traced("Hyrax::commit")
    def commit(cls, ck, polynomials, rng=None):
        if rng is None:
            raise errors.MissingRng()
        dim = ck.dim
        comms, states = [], []
        for lp in polynomials:
            n = lp.num_vars if lp.num_vars is not None else int(
                np.log2(lp.poly.shape[0])
            )
            if n % 2 == 1 or (1 << (n // 2)) != dim:
                raise errors.InvalidNumberOfVariables()
            # column-major matrix: mat[r, c] = evals[c*dim + r] (utils.rs:13-21)
            mat = jnp.swapaxes(lp.poly.reshape(dim, dim, SPEC.n_limbs), 0, 1)
            rand_ints = rng.field_ints(SPEC, dim)
            rand = F.from_ints(SPEC, rand_ints)
            # all rows in one batched Pedersen MSM: vmap over the row axis
            row_coms = _commit_rows(ck, mat, rand)
            comms.append(
                LabeledCommitment(lp.label, Commitment(row_coms), None)
            )
            states.append(CommitmentState(randomness=rand, mat=mat))
        return comms, states

    @classmethod
    @traced("Hyrax::open")
    def open(cls, ck, polynomials, commitments, point, sponge, states, rng=None):
        """mod.rs:273-406. point: tuple of nv ints."""
        if rng is None:
            raise errors.MissingRng()
        n = len(point)
        if n % 2 == 1:
            raise errors.InvalidNumberOfVariables()
        dim = 1 << (n // 2)
        pt = F.from_ints(SPEC, list(point))
        l = P.tensor_lsb(SPEC, pt[: n // 2])  # (dim, L): rows (vars 0..n/2-1)
        r = P.tensor_lsb(SPEC, pt[n // 2 :])  # (dim, L): cols

        proofs = []
        for lp, lcm, st in zip(polynomials, commitments, states):
            if lp.label != lcm.label:
                raise errors.PCError("mismatched labels")
            # transcript: key, row commitments, point (mod.rs:330-341)
            for gpt in ck.com_key_host:
                _absorb_point(sponge, (gpt[0], gpt[1], False))
            _absorb_point(sponge, (ck.h[0], ck.h[1], False))
            for rc in lcm.commitment.row_coms:
                _absorb_point(sponge, rc)
            sponge.absorb_field([int(v) % SPEC.modulus for v in point])

            # lt = l^T M; r_lt = <l, randomness>; eval = <lt, r>
            lt = _fsum0(F.mont_mul(SPEC, l[:, None, :], st.mat))  # (dim, L)
            r_lt = int(F.to_ints(SPEC, _ip(l, st.randomness)))
            eval_f = _ip(lt, r)
            eval_int = int(F.to_ints(SPEC, eval_f))

            p_mod = SPEC.modulus
            r_eval = rng.field_int(SPEC)
            com_eval = hostec.host_to_triple(
                HGROUP.add(
                    HGROUP.mul(ck.com_key_host[0], eval_int),
                    HGROUP.mul(ck.h, r_eval),
                )
            )

            d_ints = rng.field_ints(SPEC, dim)
            d = F.from_ints(SPEC, d_ints)
            b_int = int(F.to_ints(SPEC, _ip(r, d)))
            r_d = rng.field_int(SPEC)
            com_d = _pedersen(ck.com_key, d, ck.h, r_d)
            r_b = rng.field_int(SPEC)
            com_b = hostec.host_to_triple(
                HGROUP.add(
                    HGROUP.mul(ck.com_key_host[0], b_int), HGROUP.mul(ck.h, r_b)
                )
            )

            _absorb_point(sponge, com_eval)
            _absorb_point(sponge, com_d)
            _absorb_point(sponge, com_b)
            c = sponge.squeeze_field(1)[0]

            cf = F.from_ints(SPEC, c)
            z = F.add(SPEC, d, F.mont_mul(SPEC, lt, jnp.broadcast_to(cf, lt.shape)))
            z_ints = F.to_ints(SPEC, z)
            z_d = (c * r_lt + r_d) % p_mod
            z_b = (c * r_eval + r_b) % p_mod
            proofs.append(
                HyraxProof(
                    com_eval=com_eval,
                    com_d=com_d,
                    com_b=com_b,
                    z=z_ints,
                    z_d=z_d,
                    z_b=z_b,
                )
            )
        return proofs

    @classmethod
    @traced("Hyrax::check")
    def check(cls, vk, commitments, point, values, proof, sponge):
        """mod.rs:418-511 (values are not read — see module docstring)."""
        n = len(point)
        if n % 2 == 1:
            raise errors.InvalidNumberOfVariables()
        dim = 1 << (n // 2)
        pt = F.from_ints(SPEC, list(point))
        l = P.tensor_lsb(SPEC, pt[: n // 2])
        r = P.tensor_lsb(SPEC, pt[n // 2 :])
        p_mod = SPEC.modulus

        for lcm, hp in zip(commitments, proof):
            row_coms = lcm.commitment.row_coms
            if len(row_coms) != dim:
                raise errors.InvalidCommitment()
            for gpt in vk.com_key_host:
                _absorb_point(sponge, (gpt[0], gpt[1], False))
            _absorb_point(sponge, (vk.h[0], vk.h[1], False))
            for rc in row_coms:
                _absorb_point(sponge, rc)
            sponge.absorb_field([int(v) % p_mod for v in point])
            _absorb_point(sponge, hp.com_eval)
            _absorb_point(sponge, hp.com_d)
            _absorb_point(sponge, hp.com_b)
            c = sponge.squeeze_field(1)[0]

            z = F.from_ints(SPEC, [int(v) % p_mod for v in hp.z])
            rz = int(F.to_ints(SPEC, _ip(r, z)))

            # eq (14): com_key[0]*<r,z> + h*z_b == c*com_eval + com_b
            lhs = HGROUP.add(
                HGROUP.mul(vk.com_key_host[0], rz), HGROUP.mul(vk.h, hp.z_b)
            )
            rhs = HGROUP.add(
                HGROUP.mul(hostec.triple_to_host(hp.com_eval), c),
                hostec.triple_to_host(hp.com_b),
            )
            if lhs != rhs:
                return False

            # T' = MSM(row_coms, l) on device
            rc_dev = C.affine_from_ints(GROUP, row_coms)
            t_prime = M.msm_mont(GROUP, l, rc_dev)
            from ..core.serialize import device_point_to_ints

            t_host = hostec.triple_to_host(device_point_to_ints(GROUP, t_prime))

            # eq (13): Pedersen(z) + h*z_d == c*T' + com_d
            lhs2 = hostec.triple_to_host(_pedersen(vk.com_key, z, vk.h, hp.z_d))
            rhs2 = HGROUP.add(
                HGROUP.mul(t_host, c), hostec.triple_to_host(hp.com_d)
            )
            if lhs2 != rhs2:
                return False
        return True


def _commit_rows(ck, mat: jnp.ndarray, rand_mont: jnp.ndarray):
    """All row commitments: one vmapped Pippenger MSM over the row axis,
    plus the hiding column h * r via batched fixed-base mul. Under an
    active mesh the ROW axis is sharded across devices (the DP analogue of
    the reference's rayon per-row loop, hyrax/mod.rs:233-242)."""
    from ..parallel import mesh as PM

    dim = mat.shape[0]
    plain_rows = F.from_mont(SPEC, mat)  # (dim, dim, L) plain scalars

    active = PM.active_mesh()
    n_dev = (
        dict(zip(active[0].axis_names, active[0].devices.shape))[active[1]]
        if active is not None
        else 1
    )
    if active is not None and dim % n_dev == 0:
        mesh, axis = active
        row_pts = PM.batch_msm_sharded(
            GROUP, plain_rows, ck.com_key, mesh, axis, assume_distinct=True
        )
    else:
        def one_row(row_scalars):
            return M.msm(GROUP, row_scalars, ck.com_key, assume_distinct=True)

        row_pts = jax.vmap(one_row)(plain_rows)  # projective, batch (dim,)
    # hiding terms: r_i * h (batched fixed-base mul)
    h_dev = GROUP.from_affine(
        *(a[0] for a in C.affine_from_ints(GROUP, [(ck.h[0], ck.h[1], False)]))
    )
    h_terms = M.fixed_base_mul(GROUP, h_dev, F.from_mont(SPEC, rand_mont))
    total = GROUP.add(row_pts, h_terms)
    from ..core.serialize import device_points_to_ints

    return device_points_to_ints(GROUP, total)
