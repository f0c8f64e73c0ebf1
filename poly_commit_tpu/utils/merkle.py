"""Merkle tree over byte leaves (host orchestration; hash choice pluggable).

Replaces ark-crypto-primitives' MerkleTree/Path as used by the linear-code
schemes (/root/reference/poly-commit/src/linear_codes/mod.rs:506-521 builds
the tree; :443-451 verifies paths). The reference's test configuration is an
identity leaf hash + SHA-256 two-to-one compression + Blake2s column hash —
the same defaults here.

The tree is tiny relative to the encode/MSM work (one hash per column);
hashing therefore runs on host. Tree construction under the default
config (identity leaf + SHA-256 compression, the reference's test
fixture) dispatches to the native C++ batch hasher
(poly_commit_tpu.native) when available; hashlib otherwise.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Callable, List, Optional

from .. import native as _native


def sha256_compress(left: bytes, right: bytes) -> bytes:
    return hashlib.sha256(left + right).digest()


def identity_leaf(data: bytes) -> bytes:
    return data


def sha256_leaf(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def blake2s_hash(data: bytes) -> bytes:
    return hashlib.blake2s(data).digest()


@dataclasses.dataclass(frozen=True)
class MerkleConfig:
    """leaf_hash: leaf bytes -> digest; compress: (l, r) -> parent digest."""

    leaf_hash: Callable[[bytes], bytes] = identity_leaf
    compress: Callable[[bytes, bytes], bytes] = sha256_compress


@dataclasses.dataclass
class MerklePath:
    leaf_index: int
    siblings: List[bytes]  # bottom-up sibling digests


class MerkleTree:
    """Perfect binary tree; leaves padded to a power of two with b''."""

    def __init__(self, leaves: List[bytes], config: MerkleConfig | None = None):
        self.config = config or MerkleConfig()
        n = max(1, len(leaves))
        size = 1 << (n - 1).bit_length()
        padded = list(leaves) + [b""] * (size - len(leaves))
        level = [self.config.leaf_hash(l) for l in padded]
        self.levels = [level]
        if (
            self.config.leaf_hash is identity_leaf
            and self.config.compress is sha256_compress
            and len(level) > 1
        ):
            native_levels = _native.merkle_levels(_native.SHA256, level)
            if native_levels is not None:
                self.levels += native_levels
                return
        while len(level) > 1:
            level = [
                self.config.compress(level[i], level[i + 1])
                for i in range(0, len(level), 2)
            ]
            self.levels.append(level)

    @property
    def root(self) -> bytes:
        return self.levels[-1][0]

    def generate_proof(self, index: int) -> MerklePath:
        siblings = []
        i = index
        for level in self.levels[:-1]:
            siblings.append(level[i ^ 1])
            i >>= 1
        return MerklePath(leaf_index=index, siblings=siblings)


def verify_path(path: MerklePath, root: bytes, leaf: bytes,
                config: MerkleConfig | None = None) -> bool:
    config = config or MerkleConfig()
    node = config.leaf_hash(leaf)
    i = path.leaf_index
    for sib in path.siblings:
        node = config.compress(sib, node) if i & 1 else config.compress(node, sib)
        i >>= 1
    return node == root
