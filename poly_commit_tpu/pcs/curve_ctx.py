"""Pairing-curve context: everything a KZG-family scheme needs to run over
one (G1, G2, e) instantiation.

The reference instantiates every pairing scheme over BOTH BLS12-377 and
BLS12-381 (/root/reference/poly-commit/src/marlin/marlin_pc/mod.rs:531-815,
sonic_pc, marlin_pst13_pc) via Rust generics over `Pairing`. The TPU build's
equivalent is this small context object: device groups + scalar field +
host mirrors + a pairing-product backend, threaded through pcs/kzg10.py and
picked per scheme class (MarlinKZG10 vs MarlinKZG10_BLS12_377, ...).
"""

from __future__ import annotations

import dataclasses
import functools

from ..core import curve as C
from ..core import field_params as FP
from ..core import hostec
from ..core.field_params import FieldSpec


@dataclasses.dataclass(frozen=True)
class CurveCtx:
    name: str
    g1: object  # device WeierstrassGroup
    g2: object
    spec: FieldSpec  # scalar field Fr
    device_pairing_ok: bool  # core/pairing.py kernels exist for this curve

    @functools.cached_property
    def hg1(self):
        return hostec.host_group(self.g1)

    @functools.cached_property
    def hg2(self):
        return hostec.host_group(self.g2)

    @functools.cached_property
    def engine(self):
        """Generic host pairing engine (core/pairing_generic.py)."""
        from ..core import pairing_generic as PG

        return PG.bls12_381() if self.name == "bls12_381" else PG.bls12_377()

    def pairing_product_is_one(self, g1_triples, g2_triples,
                               prepared=None) -> bool:
        """prod e(P_i, Q_i) == 1 from host int triples; dispatches between
        the device kernels (TPU, 381 only) and the host engines.

        prepared: optional list parallel to g2_triples of
        ``engine.prepare_g2`` outputs (PreparedVerifierKey analogue,
        kzg10/data_structures.rs:285-312); used on the host engines."""
        if self.device_pairing_ok:
            from . import kzg10

            if kzg10.pairing_backend() == "device":
                p_aff = C.affine_from_ints(self.g1, g1_triples)
                q_aff = C.affine_from_ints(self.g2, g2_triples)
                return kzg10.pairing_check_padded(p_aff, q_aff)
            if self.name == "bls12_381" and prepared is None:
                from ..core import host_pairing as HP

                return HP.pairing_product_is_one(g1_triples, g2_triples)
        return self.engine.pairing_product_is_one(
            g1_triples, g2_triples, prepared
        )

    def prepare_g2(self, q_triple):
        """Host-engine G2 line-coefficient precomputation."""
        return self.engine.prepare_g2(q_triple)


CTX_BLS12_381 = CurveCtx(
    name="bls12_381",
    g1=C.BLS12_381_G1,
    g2=C.BLS12_381_G2,
    spec=FP.FR_BLS12_381,
    device_pairing_ok=True,
)

CTX_BLS12_377 = CurveCtx(
    name="bls12_377",
    g1=C.BLS12_377_G1,
    g2=C.BLS12_377_G2,
    spec=FP.FR_BLS12_377,
    device_pairing_ok=False,
)
