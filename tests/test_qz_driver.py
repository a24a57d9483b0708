"""Tests for the multishift QZ + AED driver (large-n GEP path)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from starneig_tpu.config import SchurConf
from starneig_tpu.errors import Error
from starneig_tpu.ops.qz_driver import qz_schur
from starneig_tpu.ops.hess_triangular import hessenberg_triangular
from starneig_tpu.testing import (
    random_dense,
    residual_gep,
    orthogonality,
    schur_structure_error,
    eigenvalue_error,
)
from starneig_tpu.testing.hooks import triangular_structure_error


def _run(n, seed, conf=None):
    A = random_dense(n, seed=seed)
    B = random_dense(n, seed=seed + 77) + 3 * np.eye(n)
    H, T, Q, Z = hessenberg_triangular(A, B)
    S, Tt, Qo, Zo, ar, ai, bt, info = qz_schur(H, T, Q, Z, conf=conf)
    return A, B, *map(np.asarray, (S, Tt, Qo, Zo)), \
        np.asarray(ar), np.asarray(ai), np.asarray(bt), info


def _check(A, B, S, Tt, Q, Z, atol_u=5000):
    assert schur_structure_error(S) == 0.0
    assert triangular_structure_error(Tt) == 0.0
    ra, rb = residual_gep(A, B, S, Tt, Q, Z)
    assert ra < atol_u and rb < atol_u, (ra, rb)
    assert orthogonality(Q) < atol_u and orthogonality(Z) < atol_u


def test_qz_driver_small_path():
    # whole problem below small_limit: single window solve
    A, B, S, Tt, Q, Z, ar, ai, bt, info = _run(48, seed=1)
    assert info == Error.SUCCESS
    _check(A, B, S, Tt, Q, Z)


def test_qz_driver_aed_path():
    n = 150
    conf = SchurConf(small_limit=32, aed_window_size=24, aed_shift_count=16)
    A, B, S, Tt, Q, Z, ar, ai, bt, info = _run(n, seed=3, conf=conf)
    assert info == Error.SUCCESS
    _check(A, B, S, Tt, Q, Z)
    ev_ref = scipy.linalg.eigvals(A, B)
    safe = np.where(np.abs(bt) < 1e-12, 1e-12, bt)
    ev = (ar + 1j * ai) / safe
    assert eigenvalue_error(ev, ev_ref) < 5e5
