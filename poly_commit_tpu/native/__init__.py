"""Native (C++) host runtime: batched hashing + Merkle level construction.

The reference's hash/Merkle layer is native Rust (ark-crypto-primitives
CRHScheme + MerkleTree, /root/reference/poly-commit/src/linear_codes/
mod.rs:506-521); this package is its native C++ counterpart on the TPU
build's host side. The shared library is compiled from pc_native.cpp with
g++ on first use (no pybind11 in the image — plain C ABI via ctypes) and
cached next to the source; import degrades gracefully to None so pure-
Python fallbacks (hashlib) keep everything working without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pc_native.cpp")
_SO = os.path.join(_HERE, "pc_native.so")

SHA256 = 0
BLAKE2S = 1

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        # unique temp name: two processes building concurrently must not
        # interleave output into the same file before os.replace
        tmp = f"{_SO}.{os.getpid()}.tmp"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, _SO)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("POLY_COMMIT_NATIVE", "1") in ("0", "false"):
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.pc_hash_many.argtypes = [
                ctypes.c_int, ctypes.c_char_p, ctypes.c_uint64,
                ctypes.c_uint64, ctypes.c_char_p,
            ]
            lib.pc_merkle_levels.argtypes = [
                ctypes.c_int, ctypes.c_char_p, ctypes.c_uint64,
                ctypes.c_uint64, ctypes.c_char_p,
            ]
            lib.pc_native_abi_version.restype = ctypes.c_int
            if lib.pc_native_abi_version() != 1:
                return None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def hash_many(alg: int, msgs: list[bytes]) -> list[bytes] | None:
    """Hash equal-length messages; None if native is unavailable or lengths
    ragged (callers fall back to hashlib)."""
    lib = get_lib()
    if lib is None or not msgs:
        return None
    mlen = len(msgs[0])
    if any(len(m) != mlen for m in msgs):
        return None
    blob = b"".join(msgs)
    out = ctypes.create_string_buffer(32 * len(msgs))
    lib.pc_hash_many(alg, blob, mlen, len(msgs), out)
    raw = out.raw
    return [raw[32 * i : 32 * i + 32] for i in range(len(msgs))]


def merkle_levels(alg: int, leaves: list[bytes]) -> list[list[bytes]] | None:
    """All internal levels (bottom-up) for a power-of-two list of equal-
    length leaves under identity leaf hashing; None when not applicable."""
    lib = get_lib()
    n = len(leaves)
    if lib is None or n < 2 or n & (n - 1):
        return None
    llen = len(leaves[0])
    if any(len(l) != llen for l in leaves):
        return None
    blob = b"".join(leaves)
    out = ctypes.create_string_buffer(32 * (n - 1))
    lib.pc_merkle_levels(alg, blob, llen, n, out)
    raw = out.raw
    levels = []
    off = 0
    width = n // 2
    while width >= 1:
        levels.append([raw[32 * (off + i) : 32 * (off + i) + 32] for i in range(width)])
        off += width
        width //= 2
    return levels
