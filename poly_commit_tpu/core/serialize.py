"""Canonical serialization codec (framework-defined, deterministic).

Plays the role of arkworks' CanonicalSerialize (used to hash commitments
into transcripts — e.g. ipa_pc/mod.rs:139-160 hashes serialized points — and
to persist keys/proofs, the reference's "checkpoint" analogue, SURVEY §5.4).

Format v1 (little-endian throughout):
  field element   -> ceil(num_bits/8) LE bytes of the canonical integer
  G1/G2 affine    -> x coords (Fq or Fq2 as c0||c1) + 1 flag byte
                     (bit0: infinity, bit1: y is the lexicographically
                     larger root)  [compressed]
  uncompressed    -> x || y || flag byte
"""

from __future__ import annotations

import numpy as np

from . import field as F
from .field_params import FieldSpec


def field_to_bytes(spec: FieldSpec, value: int) -> bytes:
    return (int(value) % spec.modulus).to_bytes(spec.serialized_size(), "little")


def field_from_bytes(spec: FieldSpec, data: bytes) -> int:
    v = int.from_bytes(data, "little")
    assert v < spec.modulus
    return v


def fields_to_bytes(spec: FieldSpec, values) -> bytes:
    return b"".join(field_to_bytes(spec, v) for v in values)


def _x_ints(group, x):
    spec = group.fops.spec
    if group.fops.elem_ndim == 1:
        return [x]
    return list(x)


def point_to_bytes(group, affine_int_point) -> bytes:
    """affine_int_point: (x, y, inf) with python-int coords (tuples for Fq2)."""
    spec = group.fops.spec
    x, y, inf = affine_int_point
    if inf:
        return bytes(spec.serialized_size() * group.fops.elem_ndim) + b"\x01"
    xs = [x] if group.fops.elem_ndim == 1 else list(x)
    ys = [y] if group.fops.elem_ndim == 1 else list(y)
    flag = 2 if _y_is_larger(spec, ys) else 0
    return fields_to_bytes(spec, xs) + bytes([flag])


def _y_is_larger(spec, ys) -> bool:
    # lexicographic from the last coordinate (matches negation flipping)
    neg = [(spec.modulus - y) % spec.modulus for y in ys]
    return ys[::-1] > neg[::-1]


def point_to_bytes_uncompressed(group, affine_int_point) -> bytes:
    spec = group.fops.spec
    x, y, inf = affine_int_point
    if inf:
        return bytes(2 * spec.serialized_size() * group.fops.elem_ndim) + b"\x01"
    xs = [x] if group.fops.elem_ndim == 1 else list(x)
    ys = [y] if group.fops.elem_ndim == 1 else list(y)
    return fields_to_bytes(spec, xs) + fields_to_bytes(spec, ys) + b"\x00"


def point_size(group, compressed=True) -> int:
    per = group.fops.spec.serialized_size() * group.fops.elem_ndim
    return (per if compressed else 2 * per) + 1


def device_point_to_ints(group, pt_proj):
    """Projective device point -> (x, y, inf) python ints (host transfer)."""
    x, y, inf = group.to_affine(pt_proj)
    xi = group.fops.to_int(x)
    yi = group.fops.to_int(y)
    return (xi, yi, bool(np.asarray(inf)))


def device_points_to_ints(group, pts_proj):
    """Batched projective points -> list of (x, y, inf) int triples."""
    x, y, inf = group.to_affine(pts_proj)
    xi = group.fops.to_int(x)
    yi = group.fops.to_int(y)
    infs = np.asarray(inf).tolist()
    if group.fops.elem_ndim == 2:
        xi = list(zip(xi[0], xi[1]))
        yi = list(zip(yi[0], yi[1]))
    return list(zip(xi, yi, infs))
