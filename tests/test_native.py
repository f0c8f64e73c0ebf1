"""Native C++ host runtime (batched hashing + Merkle levels) vs hashlib.

Mirrors the reference's Merkle test fixture shape (identity leaf hash +
SHA-256 compression, linear_codes/*/tests.rs MerkleTreeParams) — the
native path must be byte-identical to the pure-Python tree.
"""

import hashlib

import pytest

from poly_commit_tpu import native
from poly_commit_tpu.utils import merkle


requires_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


@requires_native
def test_hash_many_matches_hashlib(rng):
    msgs = [rng.bytes(57) for _ in range(33)]
    out = native.hash_many(native.SHA256, msgs)
    assert out == [hashlib.sha256(m).digest() for m in msgs]
    out2 = native.hash_many(native.BLAKE2S, msgs)
    assert out2 == [hashlib.blake2s(m).digest() for m in msgs]


@requires_native
def test_hash_many_block_boundaries():
    for mlen in (0, 1, 31, 32, 55, 56, 63, 64, 65, 127, 128, 200):
        msgs = [bytes([i % 251] * mlen) for i in range(5)]
        assert native.hash_many(native.SHA256, msgs) == [
            hashlib.sha256(m).digest() for m in msgs
        ]
        assert native.hash_many(native.BLAKE2S, msgs) == [
            hashlib.blake2s(m).digest() for m in msgs
        ]


@requires_native
def test_merkle_levels_match_python(rng):
    leaves = [rng.bytes(48) for _ in range(16)]
    tree = merkle.MerkleTree(leaves)  # native path
    # pure-python reference
    level = list(leaves)
    ref_levels = [level]
    while len(level) > 1:
        level = [
            hashlib.sha256(level[i] + level[i + 1]).digest()
            for i in range(0, len(level), 2)
        ]
        ref_levels.append(level)
    assert tree.levels == ref_levels
    path = tree.generate_proof(5)
    assert merkle.verify_path(path, tree.root, leaves[5])


def test_merkle_fallback_ragged(rng):
    # non-power-of-two leaf count pads with b'' -> ragged -> python path;
    # result must still verify
    leaves = [rng.bytes(16) for _ in range(5)]
    tree = merkle.MerkleTree(leaves)
    for i, leaf in enumerate(leaves):
        assert merkle.verify_path(tree.generate_proof(i), tree.root, leaf)
