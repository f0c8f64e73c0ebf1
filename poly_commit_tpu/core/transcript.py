"""Fiat-Shamir transcripts: Poseidon sponge over any FieldSpec (host-side).

Replaces ark-crypto-primitives' ``PoseidonSponge`` as used by the reference
(CHALLENGE_SIZE = Truncated(128) squeezes, lib.rs:580; sponge plumbing through
every scheme's open/check). The sponge is tiny and strictly sequential, so it
runs on host with python ints (the reference likewise runs it on CPU); device
interop happens only at absorb (serialize commitments) and squeeze (ship
challenges via field.from_ints).

Parameters are generated deterministically from the field modulus with
SHAKE-256 (grain-style): alpha = 17 (odd, coprime to p-1 for all our fields —
the reference's test profile uses the same exponent, lib.rs:1396), 8 full + 31
partial rounds, rate 2 / capacity 1, and a random invertible MDS. Arkworks'
test constants come from its test_rng, which we intentionally do not imitate;
prover/verifier consistency is what the protocol needs.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib

import numpy as np

from . import field as F
from .field_params import FieldSpec

ALPHA = 17
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 31
RATE = 2
CAPACITY = 1
WIDTH = RATE + CAPACITY
CHALLENGE_BITS = 128  # lib.rs:580 Truncated(128)


@functools.lru_cache(maxsize=16)
def poseidon_params(spec: FieldSpec):
    """Deterministic (modulus-seeded) ARK and MDS constants as python ints."""
    p = spec.modulus
    seed = b"tpu-poly-commit poseidon v1|" + p.to_bytes(64, "little")
    shake = hashlib.shake_256(seed)
    nbytes = (spec.num_bits + 15) // 8  # oversample to debias
    stream = shake.digest((FULL_ROUNDS + PARTIAL_ROUNDS) * WIDTH * nbytes + 64 * nbytes)
    pos = 0

    def draw():
        nonlocal pos
        v = int.from_bytes(stream[pos : pos + nbytes], "little") % p
        pos += nbytes
        return v

    ark = [[draw() for _ in range(WIDTH)] for _ in range(FULL_ROUNDS + PARTIAL_ROUNDS)]
    # Cauchy MDS: m[i][j] = 1/(x_i + y_j) with distinct x, y — invertible
    xs = [draw() for _ in range(WIDTH)]
    ys = [draw() for _ in range(WIDTH)]
    mds = [[pow((xs[i] + ys[j]) % p, -1, p) for j in range(WIDTH)] for i in range(WIDTH)]
    return ark, mds


class PoseidonSponge:
    """Duplex sponge; state layout [capacity || rate] (arkworks convention)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.p = spec.modulus
        self.ark, self.mds = poseidon_params(spec)
        self.state = [0] * WIDTH
        self.mode = "absorb"
        self.pos = 0  # next rate slot

    def clone(self) -> "PoseidonSponge":
        """Independent copy (for deriving side-channel randomness without
        perturbing the protocol transcript)."""
        c = PoseidonSponge.__new__(PoseidonSponge)
        c.spec, c.p, c.ark, c.mds = self.spec, self.p, self.ark, self.mds
        c.state = list(self.state)
        c.mode, c.pos = self.mode, self.pos
        return c

    # -- permutation --
    def _permute(self):
        p = self.p
        s = self.state
        half = FULL_ROUNDS // 2
        for r in range(FULL_ROUNDS + PARTIAL_ROUNDS):
            s = [(x + a) % p for x, a in zip(s, self.ark[r])]
            if r < half or r >= half + PARTIAL_ROUNDS:
                s = [pow(x, ALPHA, p) for x in s]
            else:
                s[0] = pow(s[0], ALPHA, p)
            s = [sum(m * x for m, x in zip(row, s)) % p for row in self.mds]
        self.state = s

    # -- absorbing --
    def absorb_field(self, elems):
        """Absorb an iterable of python-int field elements."""
        if self.mode != "absorb":
            self.mode = "absorb"
            self.pos = 0
        for e in elems:
            if self.pos == RATE:
                self._permute()
                self.pos = 0
            self.state[CAPACITY + self.pos] = (
                self.state[CAPACITY + self.pos] + int(e) % self.p
            ) % self.p
            self.pos += 1

    def absorb_bytes(self, data: bytes):
        """Pack bytes into field elements ((num_bits-1)//8 bytes each, LE)."""
        chunk = max(1, (self.spec.num_bits - 1) // 8)
        elems = [
            int.from_bytes(data[i : i + chunk], "little")
            for i in range(0, len(data), chunk)
        ]
        # length domain-separation so absorb(b"ab")+absorb(b"c") != absorb(b"abc")
        self.absorb_field([len(data)])
        self.absorb_field(elems)

    def absorb_device_field(self, spec: FieldSpec, arr):
        """Absorb device field elements (Montgomery limb arrays)."""
        vals = F.to_ints(spec, arr)
        if isinstance(vals, int):
            vals = [vals]
        flat = np.asarray(vals, dtype=object).ravel().tolist()
        self.absorb_field(flat)

    # -- squeezing --
    def _squeeze_elems(self, n):
        if self.mode != "squeeze":
            self._permute()
            self.mode = "squeeze"
            self.pos = 0
        out = []
        for _ in range(n):
            if self.pos == RATE:
                self._permute()
                self.pos = 0
            out.append(self.state[CAPACITY + self.pos])
            self.pos += 1
        return out

    def squeeze_field(self, n=1):
        """n full field elements (python ints)."""
        return self._squeeze_elems(n)

    def squeeze_bits(self, nbits):
        per = self.spec.num_bits - 1
        n = -(-nbits // per)
        elems = self._squeeze_elems(n)
        bits = []
        for e in elems:
            bits.extend((e >> i) & 1 for i in range(per))
        return bits[:nbits]

    def squeeze_bytes(self, nbytes):
        bits = self.squeeze_bits(8 * nbytes)
        return bytes(
            sum(bits[8 * i + j] << j for j in range(8)) for i in range(nbytes)
        )

    def squeeze_challenge_128(self):
        """The reference's Truncated(128) opening challenge (lib.rs:580)."""
        bits = self.squeeze_bits(CHALLENGE_BITS)
        return sum(b << i for i, b in enumerate(bits))

    def squeeze_challenges_128(self, n):
        return [self.squeeze_challenge_128() for _ in range(n)]
