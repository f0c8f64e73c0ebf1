"""Key/commitment/proof persistence — the reference's checkpoint analogue.

The reference's "checkpoints" are CanonicalSerialize'd SRS/key files, with
prepared pairing elements rebuilt on load (SURVEY.md §5.4,
kzg10/data_structures.rs:57-112). Here, any scheme object built from device
limb arrays, python ints, bytes, and dataclasses round-trips through one
.npz container: device arrays are stored as numpy, ints/bytes/structure as a
JSON-encoded skeleton. Prepared/derived values are NOT stored — they are
reconstructed by the owning dataclass on first use, matching the reference's
split between persisted and recomputed state.
"""

from __future__ import annotations

import dataclasses
import io
import json
from typing import Any

import jax.numpy as jnp
import numpy as np

_TAG = "__pct__"


def _encode(obj: Any, arrays: list):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            _TAG: "dataclass",
            "cls": f"{type(obj).__module__}:{type(obj).__qualname__}",
            "fields": {
                f.name: _encode(getattr(obj, f.name), arrays)
                for f in dataclasses.fields(obj)
            },
        }
    if isinstance(obj, (jnp.ndarray, np.ndarray)):
        arrays.append(np.asarray(obj))
        return {_TAG: "array", "i": len(arrays) - 1}
    if isinstance(obj, bytes):
        return {_TAG: "bytes", "hex": obj.hex()}
    if isinstance(obj, int) and abs(obj) >= 2**53:
        return {_TAG: "bigint", "hex": hex(obj)}
    if isinstance(obj, tuple):
        return {_TAG: "tuple", "items": [_encode(x, arrays) for x in obj]}
    if isinstance(obj, list):
        return [_encode(x, arrays) for x in obj]
    if isinstance(obj, dict):
        return {
            _TAG: "dict",
            "items": [
                [_encode(k, arrays), _encode(v, arrays)] for k, v in obj.items()
            ],
        }
    return obj  # JSON-native (small int, float, str, bool, None)


def _decode(node: Any, arrays):
    if isinstance(node, list):
        return [_decode(x, arrays) for x in node]
    if not isinstance(node, dict):
        return node
    tag = node.get(_TAG)
    if tag == "array":
        return jnp.asarray(arrays[node["i"]])
    if tag == "bytes":
        return bytes.fromhex(node["hex"])
    if tag == "bigint":
        return int(node["hex"], 16)
    if tag == "tuple":
        return tuple(_decode(x, arrays) for x in node["items"])
    if tag == "dict":
        return {
            _freeze(_decode(k, arrays)): _decode(v, arrays)
            for k, v in node["items"]
        }
    if tag == "dataclass":
        mod, qual = node["cls"].split(":")
        import importlib

        cls = importlib.import_module(mod)
        for part in qual.split("."):
            cls = getattr(cls, part)
        return cls(**{k: _decode(v, arrays) for k, v in node["fields"].items()})
    return node


def _freeze(x):
    return tuple(x) if isinstance(x, list) else x


def save(path: str, obj: Any) -> None:
    """Serialize a scheme object (keys, commitments, proofs) to one file."""
    arrays: list = []
    skeleton = json.dumps(_encode(obj, arrays))
    np.savez_compressed(
        path,
        skeleton=np.frombuffer(skeleton.encode(), dtype=np.uint8),
        **{f"a{i}": a for i, a in enumerate(arrays)},
    )


def load(path: str) -> Any:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        skeleton = json.loads(bytes(z["skeleton"].tobytes()).decode())
        arrays = [z[f"a{i}"] for i in range(len(z.files) - 1)]
    return _decode(skeleton, arrays)
