"""Persistence (checkpoint analogue) and trace-scope round trips."""

import os

import jax.numpy as jnp
import numpy as np

from poly_commit_tpu.core import field as F
from poly_commit_tpu.core.field_params import FR_BLS12_381
from poly_commit_tpu.utils import persist, trace


def test_persist_roundtrip_nested(tmp_path):
    from poly_commit_tpu.pcs.kzg10 import Commitment, Proof

    obj = {
        "arr": F.from_ints(FR_BLS12_381, [1, 2, 3]),
        "proof": Proof(w=(123456789012345678901234567890, 42, False), random_v=7),
        "comm": [Commitment(point=(1, 2, False))],
        "tup": (b"\x00\x01", 5, "label"),
    }
    p = str(tmp_path / "obj.npz")
    persist.save(p, obj)
    back = persist.load(p)
    assert np.array_equal(np.asarray(back["arr"]), np.asarray(obj["arr"]))
    assert back["proof"].w == obj["proof"].w
    assert back["proof"].random_v == 7
    assert back["comm"][0].point == (1, 2, False)
    assert back["tup"] == (b"\x00\x01", 5, "label")


def test_persist_universal_params(tmp_path):
    """An SRS (device arrays + metadata) survives a save/load cycle."""
    from poly_commit_tpu.pcs import kzg10

    from poly_commit_tpu.pcs.data_structures import HostRng

    pp = kzg10.setup(4, rng=HostRng(1))
    p = str(tmp_path / "srs.npz")
    persist.save(p, pp)
    back = persist.load(p)
    assert back.max_degree == pp.max_degree
    for a, b in zip(back.powers_of_g, pp.powers_of_g):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_trace_scope_output(capsys):
    os.environ["POLY_COMMIT_TRACE"] = "1"
    try:
        with trace.scope("outer"):
            with trace.scope("inner"):
                pass
    finally:
        os.environ.pop("POLY_COMMIT_TRACE")
    err = capsys.readouterr().err
    assert "Start: outer" in err and "End: inner" in err
