"""Ligero (univariate + multilinear): Reed-Solomon rows via the NTT kernel.

Re-design of /root/reference/poly-commit/src/linear_codes/ligero.rs (params,
dimension selection :118-128, max degree from 2-adicity :48-56) and
univariate_ligero/mod.rs + multilinear_ligero/mod.rs (encode = reed_solomon,
tensors; rho_inv = 4 univariate / 2 multilinear; sec_param 128,
well-formedness on). RS encode (linear_codes/utils.rs:112-127) is a batched
radix-2 NTT over the extended power-of-two domain — rows encode in ONE
device kernel call.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from ...core import field as F
from ...core import ntt as NTT
from ...core import poly as P
from ...utils.merkle import MerkleConfig
from .engine import LinearCodePCS
from .utils import calculate_t, ceil_div, tensor_vec


@dataclasses.dataclass(frozen=True)
class LigeroPCParams:
    """ligero.rs:22-39; doubles as UniversalParams/CommitterKey/VerifierKey."""

    spec: object
    sec_param: int = 128
    rho_inv: int = 4
    check_well_formedness: bool = True

    def distance(self):
        return (self.rho_inv - 1, self.rho_inv)

    def max_degree_supported(self):
        """ligero.rs:48-56: bounded by the field's 2-adicity."""
        ta = self.spec.two_adicity
        if ta < int(math.log2(self.rho_inv)):
            return 0
        ex = (ta - int(math.log2(self.rho_inv))) * 2
        return 1 << min(ex, 62)

    def compute_dimensions(self, poly_len: int):
        """ligero.rs:118-128."""
        t = calculate_t(self.spec, self.sec_param, self.distance(), poly_len)
        base = math.ceil(math.sqrt(ceil_div(2 * poly_len, t)))
        n = 1 << max(0, (base - 1).bit_length())  # next power of two
        m = ceil_div(poly_len, n)
        return (n, m)

    def merkle_config(self):
        return MerkleConfig()


def _rs_encode_rows(mat: jnp.ndarray, ck: LigeroPCParams) -> jnp.ndarray:
    """RS = batched NTT over the smallest 2^k >= m * rho_inv
    (linear_codes/utils.rs:112-127).

    Dispatch: limbs-first fused tier (core/ntt_lf — one Pallas launch per
    butterfly stage across ALL rows) on TPU; row-sharded across an active
    mesh (DP over the matrix rows, SURVEY §2.5); portable kernel otherwise.
    """
    import jax
    import numpy as np

    m = mat.shape[-2]
    ext = 1 << max(1, (m * ck.rho_inv - 1).bit_length())
    pad = [(0, 0)] * (mat.ndim - 2) + [(0, ext - m), (0, 0)]
    padded = jnp.pad(mat, pad)

    from ...parallel import mesh as PM

    active = PM.active_mesh()
    if active is not None and padded.ndim == 3:
        mesh, axis = active
        n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
        if padded.shape[0] % n_dev == 0:
            return PM.batch_ntt_sharded(ck.spec, padded, mesh, axis)

    if jax.default_backend() == "tpu" and padded.ndim >= 2:
        from ...core import ff, ntt_lf

        batch = int(np.prod(padded.shape[:-1])) // ext
        lf = ff.from_field_last(padded)  # (L, batch*ext), block-contiguous
        out = ff.canonicalize(ck.spec, ntt_lf.ntt(ck.spec, lf, rows=batch))
        return ff.to_field_last(out, padded.shape[:-1])
    return NTT.ntt(ck.spec, padded)


class UnivariateLigeroCode:
    """univariate_ligero/mod.rs:27-87."""

    def __init__(self, spec):
        self.spec = spec

    def setup(self, max_degree, num_vars, rng):
        return LigeroPCParams(spec=self.spec, sec_param=128, rho_inv=4,
                              check_well_formedness=True)

    def poly_to_vec(self, lp):
        return lp.poly

    def point_to_vec(self, point):
        return [int(point) % self.spec.modulus]

    def tensor(self, point, n_cols, n_rows):
        """a = (1, z, ..., z^{m-1}); b = (1, z^m, ..., z^{m(n-1)})."""
        z = F.from_ints(self.spec, int(point) % self.spec.modulus)
        a = P.powers(self.spec, z, n_cols)
        zm = P.powers(self.spec, z, n_cols + 1)[n_cols]
        b = P.powers(self.spec, zm, n_rows)
        return a, b

    def evaluate_poly(self, lp, point):
        z = F.from_ints(self.spec, int(point) % self.spec.modulus)
        return int(F.to_ints(self.spec, P.evaluate(self.spec, lp.poly, z)))

    def encode_rows(self, mat, ck):
        return _rs_encode_rows(mat, ck)


class MultilinearLigeroCode:
    """multilinear_ligero/mod.rs:30-84 (rho_inv = 2)."""

    def __init__(self, spec):
        self.spec = spec

    def setup(self, max_degree, num_vars, rng):
        return LigeroPCParams(spec=self.spec, sec_param=128, rho_inv=2,
                              check_well_formedness=True)

    def poly_to_vec(self, lp):
        return lp.poly  # (2^nv, L) evaluation table

    def point_to_vec(self, point):
        return [int(z) % self.spec.modulus for z in point]

    def tensor(self, point, n_cols, n_rows):
        split = (n_cols - 1).bit_length()
        pt = F.from_ints(self.spec, self.point_to_vec(point))
        a = tensor_vec(self.spec, pt[:split])
        b = tensor_vec(self.spec, pt[split:])
        return a, b

    def evaluate_poly(self, lp, point):
        pt = F.from_ints(self.spec, self.point_to_vec(point))
        return int(F.to_ints(self.spec, P.mle_evaluate(self.spec, lp.poly, pt)))

    def encode_rows(self, mat, ck):
        return _rs_encode_rows(mat, ck)


def make_univariate_ligero(spec):
    code = UnivariateLigeroCode(spec)

    class UnivariateLigero(LinearCodePCS):
        pass

    UnivariateLigero.spec = spec
    UnivariateLigero.code = code
    UnivariateLigero.__name__ = f"UnivariateLigero_{spec.name}"
    return UnivariateLigero


def make_multilinear_ligero(spec):
    code = MultilinearLigeroCode(spec)

    class MultilinearLigero(LinearCodePCS):
        pass

    MultilinearLigero.spec = spec
    MultilinearLigero.code = code
    MultilinearLigero.__name__ = f"MultilinearLigero_{spec.name}"
    return MultilinearLigero
