"""Generic linear-code PCS engine (commit / open / check once for all codes).

Re-design of /root/reference/poly-commit/src/linear_codes/mod.rs:150-566:
  commit          mod.rs:228-298  (matrix -> row-encode -> column hashes ->
                                   Merkle root)
  open            mod.rs:300-373 + generate_proof mod.rs:523-566
  check           mod.rs:375-502  (path verify, re-encode w = E(v),
                                   per-column inner products, <v, a> = value)
  create_merkle_tree  mod.rs:506-521

Code-specific behavior is injected via a `code` object (the LinearEncode
analogue, mod.rs:78-147): compute_dimensions, encode (device, batched over
rows), tensor, poly_to_vec, point_to_vec, plus parameter accessors.

TPU mapping: the coefficient matrix and the encoded matrix live on device;
row encoding is one batched kernel (NTT for Ligero, gather/segment kernels
for Brakedown); v = b^T M is a batched field kernel. Column hashing and the
Merkle tree run on host (see utils/merkle.py docstring).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp

from ...core import field as F
from ...core.serialize import field_to_bytes
from ...utils.merkle import MerkleConfig, MerklePath, MerkleTree, blake2s_hash, verify_path
from .. import errors
from ..data_structures import LabeledCommitment, PolynomialCommitment
from .utils import calculate_t, get_indices_from_sponge
from ...utils.trace import traced


@dataclasses.dataclass
class Metadata:
    n_rows: int
    n_cols: int
    n_ext_cols: int


@dataclasses.dataclass
class LinCodePCCommitment:
    metadata: Metadata
    root: bytes


@dataclasses.dataclass
class LinCodePCCommitmentState:
    mat: jnp.ndarray  # (n_rows, n_cols, L) Montgomery
    ext_mat: jnp.ndarray  # (n_rows, n_ext_cols, L)
    leaves: List[bytes]  # column hashes


@dataclasses.dataclass
class LinCodePCProofSingle:
    paths: List[MerklePath]
    v: List[int]  # b^T M (n_cols ints)
    columns: List[List[int]]  # t queried ext-matrix columns (n_rows each)


@dataclasses.dataclass
class LinCodePCProof:
    opening: LinCodePCProofSingle
    well_formedness: Optional[List[int]] = None


def _col_hash(spec, col_ints) -> bytes:
    return blake2s_hash(b"".join(field_to_bytes(spec, v) for v in col_ints))


def _row_mul(spec, vec_dev, mat_dev):
    """v^T M: vec (n, L), mat (n, m, L) -> (m, L); log-depth row sum.

    Under an active mesh the row axis is sharded (parallel/mesh.py
    row_mul_sharded — the reference's rayon loop,
    linear_codes/mod.rs:523-566); bit-identical to the local kernel."""
    from ...parallel import mesh as PM

    active = PM.active_mesh()
    if active is not None:
        mesh, axis = active
        n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
        if n_dev > 1 and vec_dev.shape[0] % n_dev == 0:
            return PM.row_mul_sharded(spec, vec_dev, mat_dev, mesh, axis)
    prod = F.mont_mul(spec, vec_dev[:, None, :], mat_dev)
    n = prod.shape[0]
    while n > 1:
        half = n // 2
        head = F.add(spec, prod[:half], prod[half : 2 * half])
        prod = head if n % 2 == 0 else jnp.concatenate([head, prod[n - 1 :]], 0)
        n = (n + 1) // 2
    return prod[0]


def _ip_ints(spec, a_ints, b_ints) -> int:
    p = spec.modulus
    return sum(int(a) * int(b) % p for a, b in zip(a_ints, b_ints)) % p


class LinearCodePCS(PolynomialCommitment):
    """Subclass with a class attribute `code` (and `spec = code.spec`)."""

    code = None  # injected by concrete schemes

    @classmethod
    @traced("LinearCodePCS::setup")
    def setup(cls, max_degree, num_vars=None, rng=None):
        pp = cls.code.setup(max_degree, num_vars, rng)
        if pp.max_degree_supported() == 0 or (
            max_degree and max_degree > pp.max_degree_supported()
        ):
            raise errors.InvalidParameters("field too small for this degree")
        return pp

    @classmethod
    def trim(cls, pp, supported_degree=0, supported_hiding_bound=0,
             enforced_degree_bounds=None):
        return pp, pp

    @classmethod
    def evaluate_poly(cls, labeled_poly, point):
        return cls.code.evaluate_poly(labeled_poly, point)

    @classmethod
    @traced("LinearCodePCS::commit")
    def commit(cls, ck, polynomials, rng=None):
        spec = cls.spec
        comms, states = [], []
        for lp in polynomials:
            coeffs = cls.code.poly_to_vec(lp)  # (len, L) device
            n_rows, n_cols = ck.compute_dimensions(int(coeffs.shape[0]))
            total = n_rows * n_cols
            if coeffs.shape[0] < total:
                coeffs = jnp.pad(coeffs, ((0, total - coeffs.shape[0]), (0, 0)))
            mat = coeffs.reshape(n_rows, n_cols, spec.n_limbs)  # row-major
            ext_mat = cls.code.encode_rows(mat, ck)  # (n_rows, ext, L)
            n_ext_cols = int(ext_mat.shape[1])

            # column hashes (host) + Merkle root
            cols = F.to_ints(spec, jnp.swapaxes(ext_mat, 0, 1))  # (ext, n_rows)
            leaves = [_col_hash(spec, col) for col in cols]
            tree = MerkleTree(leaves, ck.merkle_config())
            comms.append(
                LabeledCommitment(
                    lp.label,
                    LinCodePCCommitment(
                        Metadata(n_rows, n_cols, n_ext_cols), tree.root
                    ),
                    None,
                )
            )
            states.append(
                LinCodePCCommitmentState(mat=mat, ext_mat=ext_mat, leaves=leaves)
            )
        return comms, states

    @classmethod
    @traced("LinearCodePCS::open")
    def open(cls, ck, polynomials, commitments, point, sponge, states, rng=None):
        spec = cls.spec
        proof_array = []
        for lcm, st in zip(commitments, states):
            md = lcm.commitment.metadata
            tree = MerkleTree(st.leaves, ck.merkle_config())

            _, b = cls.code.tensor(point, md.n_cols, md.n_rows)  # device vecs
            sponge.absorb_bytes(lcm.commitment.root)

            well_formedness = None
            if ck.check_well_formedness:
                r_ints = sponge.squeeze_field(md.n_rows)
                r = F.from_ints(spec, r_ints)
                v_wf = F.to_ints(spec, _row_mul(spec, r, st.mat))
                sponge.absorb_field(v_wf)
                well_formedness = v_wf

            sponge.absorb_field(cls.code.point_to_vec(point))

            # generate_proof (mod.rs:523-566)
            t = calculate_t(spec, ck.sec_param, ck.distance(), md.n_ext_cols)
            v = F.to_ints(spec, _row_mul(spec, b, st.mat))
            sponge.absorb_field(v)
            indices = get_indices_from_sponge(md.n_ext_cols, t, sponge)
            cols_dev = jnp.swapaxes(st.ext_mat, 0, 1)
            columns, paths = [], []
            for i in indices:
                columns.append(F.to_ints(spec, cols_dev[i]))
                paths.append(tree.generate_proof(i))
            proof_array.append(
                LinCodePCProof(
                    opening=LinCodePCProofSingle(paths=paths, v=v, columns=columns),
                    well_formedness=well_formedness,
                )
            )
        return proof_array

    @classmethod
    @traced("LinearCodePCS::check")
    def check(cls, vk, commitments, point, values, proof_array, sponge):
        spec = cls.spec
        p_mod = spec.modulus
        cfg = vk.merkle_config()
        for i, (lcm, value) in enumerate(zip(commitments, values)):
            proof = proof_array[i]
            md = lcm.commitment.metadata
            root = lcm.commitment.root
            t = calculate_t(spec, vk.sec_param, vk.distance(), md.n_ext_cols)

            sponge.absorb_bytes(root)

            r_ints = None
            if vk.check_well_formedness:
                if proof.well_formedness is None:
                    raise errors.InvalidCommitment()
                r_ints = sponge.squeeze_field(md.n_rows)
                sponge.absorb_field(proof.well_formedness)

            sponge.absorb_field(cls.code.point_to_vec(point))
            sponge.absorb_field(proof.opening.v)
            indices = get_indices_from_sponge(md.n_ext_cols, t, sponge)

            # Merkle paths
            col_hashes = [_col_hash(spec, col) for col in proof.opening.columns]
            for j, (leaf, q_j) in enumerate(zip(col_hashes, indices)):
                path = proof.opening.paths[j]
                if path.leaf_index != q_j:
                    raise errors.InvalidCommitment()
                if not verify_path(path, root, leaf, cfg):
                    raise errors.InvalidCommitment()

            # re-encode w = E(v)
            v_dev = F.from_ints(spec, [int(x) % p_mod for x in proof.opening.v])
            w = F.to_ints(
                spec, cls.code.encode_rows(v_dev[None, :, :], vk)[0]
            )
            a, b_dev = cls.code.tensor(point, md.n_cols, md.n_rows)
            b_ints = F.to_ints(spec, b_dev)
            a_ints = F.to_ints(spec, a)

            if r_ints is not None:
                w_wf = F.to_ints(
                    spec,
                    cls.code.encode_rows(
                        F.from_ints(
                            spec, [int(x) % p_mod for x in proof.well_formedness]
                        )[None, :, :],
                        vk,
                    )[0],
                )
                for ti, mi in enumerate(indices):
                    if _ip_ints(spec, r_ints, proof.opening.columns[ti]) != int(
                        w_wf[mi]
                    ) % p_mod:
                        raise errors.InvalidCommitment()
                    if _ip_ints(spec, b_ints, proof.opening.columns[ti]) != int(
                        w[mi]
                    ) % p_mod:
                        raise errors.InvalidCommitment()
            else:
                for ti, mi in enumerate(indices):
                    if _ip_ints(spec, b_ints, proof.opening.columns[ti]) != int(
                        w[mi]
                    ) % p_mod:
                        raise errors.InvalidCommitment()

            if _ip_ints(spec, proof.opening.v, a_ints) != int(value) % p_mod:
                return False
        return True
