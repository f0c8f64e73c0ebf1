"""Pin derive_batch_rng's canonical encoding with fixed vectors.

derive_batch_rng seeds batch-check randomizers from a structural hash of
host data (VERDICT r3 weak #8: a silent refactor of _hash_host_obj or the
dataclass field order would change proof-verification randomness without
any test noticing). These vectors freeze the encoding; if a refactor
changes them INTENTIONALLY, update the constants in the same change.
"""

import dataclasses
import hashlib

from poly_commit_tpu.core.field_params import FR_BLS12_381
from poly_commit_tpu.core.transcript import PoseidonSponge
from poly_commit_tpu.pcs.data_structures import _hash_host_obj, derive_batch_rng


@dataclasses.dataclass
class _Probe:
    a: int
    b: str
    c: tuple


def _digest(*objs) -> str:
    h = hashlib.sha256()
    for o in objs:
        _hash_host_obj(h, o)
    return h.hexdigest()


def test_hash_host_obj_vectors():
    assert _digest(0) == _digest(0)
    # type tags separate look-alikes
    assert _digest(1) != _digest(True)
    assert _digest("1") != _digest(1)
    assert _digest((1, 2)) != _digest([1, 2, 3])
    assert _digest({"x": 1, "y": 2}) == _digest({"y": 2, "x": 1})
    # frozen encoding vectors
    assert _digest(12345678901234567890) == (
        "e9b6773e4ff87e375ce2b5a53fae0443f76a2bf3ce4f2d7b54fdf40fcf899a38"
    )
    assert _digest("label", (1, ("pt", 7)), None, b"\x00\x01") == (
        "fbb69cc011b9bcfdd9fe5267d611958c502a0656e7622d54bf10ba754b65eb06"
    )
    assert _digest(_Probe(a=5, b="x", c=(1, None))) == (
        "91c83337c230d697cde292accc3dddc3390fdd6bd5384433fc08f398cd342f40"
    )


def test_derive_batch_rng_deterministic_and_sensitive():
    sponge = PoseidonSponge(FR_BLS12_381)
    r1 = derive_batch_rng(sponge, "f", (1, 2), {"k": 3})
    r2 = derive_batch_rng(sponge, "f", (1, 2), {"k": 3})
    assert r1.u128() == r2.u128()
    r3 = derive_batch_rng(sponge, "f", (1, 2), {"k": 4})
    assert derive_batch_rng(sponge, "f", (1, 2), {"k": 3}).u128() != r3.u128()
