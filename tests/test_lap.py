"""ops/lap.py: jittable Jonker-Volgenant assignment vs scipy's Hungarian.

The reference's instance tracker relies on scipy.optimize.linear_sum_assignment
(/root/reference/fiery/utils/instance.py:6,242); the device solver must produce the
same optimal cost on every problem (assignments may differ only between equal-cost
optima, which random float costs make measure-zero).
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize

from fiery_tpu.ops.lap import linear_sum_assignment

pytestmark = pytest.mark.fast


def test_lap_matches_scipy_random():
    rng = np.random.RandomState(0)
    jitted = {}
    for trial in range(100):
        n = rng.randint(1, 32)
        scale = rng.choice([1.0, 100.0])
        C = rng.rand(n, n).astype(np.float32) * scale
        fn = jitted.setdefault(n, jax.jit(linear_sum_assignment))
        col4row = np.asarray(fn(jnp.asarray(C)))
        assert sorted(col4row.tolist()) == list(range(n)), 'not a permutation'
        r, c = scipy.optimize.linear_sum_assignment(C.astype(np.float64))
        np.testing.assert_allclose(C[np.arange(n), col4row].sum(), C[r, c].sum(),
                                   rtol=1e-5, atol=1e-5)


def test_lap_rectangular_padding():
    """Padding a rectangular problem to square with a dominating BIG cost yields
    the rectangular optimum on the valid rows (the tracker's usage pattern)."""
    rng = np.random.RandomState(1)
    n_r, n_c, K = 7, 12, 16
    C = rng.rand(n_r, n_c).astype(np.float32) * 10
    P = np.full((K, K), 1e6, np.float32)
    P[:n_r, :n_c] = C
    col4row = np.asarray(jax.jit(linear_sum_assignment)(jnp.asarray(P)))
    assert (col4row[:n_r] < n_c).all()
    r, c = scipy.optimize.linear_sum_assignment(C.astype(np.float64))
    np.testing.assert_allclose(C[np.arange(n_r), col4row[:n_r]].sum(),
                               C[r, c].sum(), rtol=1e-5)


def test_lap_n_rows_restricted():
    """n_rows-restricted augmentation (the tracker's serial-depth cut) returns
    the rectangular optimum for the kept rows and -1 for skipped rows."""
    rng = np.random.RandomState(2)
    fn = jax.jit(linear_sum_assignment)
    for n_r, n_c, K in [(1, 3, 8), (4, 4, 16), (7, 12, 101), (0, 5, 9)]:
        C = rng.rand(max(n_r, 1), n_c).astype(np.float32) * 10
        P = np.full((K, K), 1e4, np.float32)
        if n_r:
            P[:n_r, :n_c] = C[:n_r]
        col4row = np.asarray(fn(jnp.asarray(P), n_rows=jnp.int32(n_r)))
        assert (col4row[n_r:] == -1).all(), 'skipped rows must stay unassigned'
        if n_r == 0:
            continue
        assert (col4row[:n_r] < n_c).all()
        assert len(set(col4row[:n_r].tolist())) == n_r, 'duplicate columns'
        r, c = scipy.optimize.linear_sum_assignment(C[:n_r].astype(np.float64))
        np.testing.assert_allclose(C[np.arange(n_r), col4row[:n_r]].sum(),
                                   C[r, c].sum(), rtol=1e-5)


def test_lap_degenerate():
    # 1x1 and identical-cost matrices still produce valid permutations
    assert int(jax.jit(linear_sum_assignment)(jnp.zeros((1, 1)))[0]) == 0
    col = np.asarray(jax.jit(linear_sum_assignment)(jnp.ones((5, 5))))
    assert sorted(col.tolist()) == list(range(5))
