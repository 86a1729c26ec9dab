"""Direct unit tests for the cyclic-Jacobi recursive-CTE eigensolver
(__spark_entry__._jacobi_ctes) that powers the mv_vecm oracle: random
symmetric matrices of several dimensions vs numpy.linalg.eigh, plus the
degenerate branches (diagonal input -> apq=0 no-op path, repeated
eigenvalues). Pure DuckDB + numpy, no Spark."""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entrymod


def _run_jacobi(S: np.ndarray):
    n = S.shape[0]
    mat_sql = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(float(x)) for x in row) + "]" for row in S
        )
        + "]"
    )
    sql = (
        "WITH RECURSIVE src AS MATERIALIZED (SELECT "
        + mat_sql
        + "::DOUBLE[][] AS a),"
        + entrymod._jacobi_ctes("j", "src")
        + " SELECT a, v FROM j_fin"
    )
    a_fin, v_fin = duckdb.connect().execute(sql).fetchone()
    return np.array(a_fin), np.array(v_fin)


@pytest.mark.parametrize("n,seed", [(2, 0), (3, 1), (4, 2), (5, 3), (6, 4)])
def test_jacobi_matches_eigh_on_random_spd(n, seed):
    rng = np.random.RandomState(seed)
    B = rng.randn(n, n)
    S = B @ B.T + np.eye(n) * 0.1
    A, V = _run_jacobi(S)
    w_sql = np.diag(A)
    # off-diagonal annihilated to (near-)exact zero
    assert np.max(np.abs(A - np.diag(w_sql))) < 1e-12 * np.abs(w_sql).max()
    # spectrum matches LAPACK
    assert np.allclose(
        np.sort(w_sql), np.linalg.eigh(S)[0], rtol=1e-12, atol=1e-12
    )
    # columns of V are eigenvectors: S V = V diag(w)
    assert np.max(np.abs(S @ V - V @ np.diag(w_sql))) < 1e-9


def test_jacobi_diagonal_input_is_identity_rotation():
    S = np.diag([4.0, 1.0, 9.0])
    A, V = _run_jacobi(S)
    assert np.allclose(A, S, atol=0)
    assert np.allclose(V, np.eye(3), atol=0)


def test_jacobi_repeated_eigenvalues():
    # lambda = {2 (x2), 5}: eigenvalues must still come out exact even
    # though the 2-eigenspace basis is rotation-arbitrary
    Q, _ = np.linalg.qr(np.random.RandomState(9).randn(3, 3))
    S = Q @ np.diag([2.0, 2.0, 5.0]) @ Q.T
    S = (S + S.T) / 2
    A, V = _run_jacobi(S)
    w_sql = np.sort(np.diag(A))
    assert np.allclose(w_sql, [2.0, 2.0, 5.0], rtol=0, atol=1e-12)
    assert np.max(np.abs(S @ V - V @ np.diag(np.diag(A)))) < 1e-10
