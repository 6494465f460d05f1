"""Generic Tikhonov CG solver tests (ridge problem with known optimum)."""

import numpy as np

from ch_shrinkwrap_tpu.solver.tikhonov import TikhonovConjugateGradient


def test_tikhonov_solves_ridge():
    rng = np.random.default_rng(0)
    n, m = 80, 40
    A = rng.normal(size=(n, m))
    x_true = rng.normal(size=m)
    d = A @ x_true + 0.01 * rng.normal(size=n)
    lam = 0.5

    solver = TikhonovConjugateGradient(
        Afunc=lambda f: A @ f,
        Ahfunc=lambda r: A.T @ r,
    )
    # start from zero (start_guess defaults to a copy of data; override)
    solver.start_guess = lambda data: np.zeros(m)
    x = solver.search(d, [lam], num_iters=60)

    x_exact = np.linalg.solve(A.T @ A + lam * lam * np.eye(m), A.T @ d)
    np.testing.assert_allclose(x, x_exact, atol=1e-3)
    # residual trace is recorded and decreasing overall
    assert len(solver.ress) > 2
    assert solver.ress[-1] <= solver.ress[0]


def test_tikhonov_default_prior():
    """Nonzero fdef pulls the answer toward the prior at high lambda."""
    rng = np.random.default_rng(1)
    n, m = 40, 20
    A = rng.normal(size=(n, m))
    d = A @ rng.normal(size=m)
    prior = 3.0 * np.ones(m)

    solver = TikhonovConjugateGradient(
        Afunc=lambda f: A @ f, Ahfunc=lambda r: A.T @ r)
    solver.start_guess = lambda data: np.zeros(m)
    x = solver.search(d, [100.0], defaults=[prior], num_iters=50)
    np.testing.assert_allclose(x, prior, atol=0.2)
