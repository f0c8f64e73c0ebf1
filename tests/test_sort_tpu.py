"""core/sort_tpu.py — the Pallas bitonic argsort behind the MSM digit
grouping (interpret mode on CPU; the real-TPU path is exercised by
bench.py's MSM self-check and the round bench record)."""

import numpy as np
import pytest

import jax.numpy as jnp

from poly_commit_tpu.core import sort_tpu


def _check(keys, order, skeys):
    kn = np.asarray(keys).astype(np.int64)
    o = np.asarray(order)
    s = np.asarray(skeys).astype(np.int64)
    for wi in range(kn.shape[0]):
        assert sorted(o[wi].tolist()) == list(range(kn.shape[1]))
        assert (kn[wi][o[wi]] == s[wi]).all()
        assert (np.diff(s[wi]) >= 0).all()


@pytest.mark.parametrize("n", [1024, 4096])
def test_single_block(n):
    rng = np.random.default_rng(0)
    keys = jnp.asarray(
        rng.integers(0, (1 << 16) + 1, size=(3, n), dtype=np.int64),
        jnp.uint32,
    )
    order, skeys = sort_tpu.bitonic_argsort(keys, interpret=True)
    _check(keys, order, skeys)


def test_multi_block(monkeypatch):
    """Exercise the XLA large-stride phases + Pallas merge tails by
    shrinking the VMEM block."""
    monkeypatch.setattr(sort_tpu, "BLOCK", 1024)
    sort_tpu._sorter.cache_clear()
    rng = np.random.default_rng(1)
    keys = jnp.asarray(
        rng.integers(0, 1 << 16, size=(2, 8192), dtype=np.int64), jnp.uint32
    )
    order, skeys = sort_tpu.bitonic_argsort(keys, interpret=True)
    _check(keys, order, skeys)
    sort_tpu._sorter.cache_clear()


def test_duplicates_and_extremes():
    rng = np.random.default_rng(2)
    n = 1024
    keys = np.zeros((2, n), np.uint32)
    keys[0] = rng.integers(0, 4, size=n)  # heavy duplication
    keys[1, : n // 2] = 1 << 16  # sentinel-heavy window
    order, skeys = sort_tpu.bitonic_argsort(jnp.asarray(keys), interpret=True)
    _check(keys, order, skeys)
