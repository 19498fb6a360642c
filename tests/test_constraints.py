"""Constraint builder tests (reference: test/UnitTests/constraints.jl).

Constructors across input kinds, set-type instantiation, index embedding,
and the assemble-time merging of same-type constraints.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import cosmo_tpu as ct
from cosmo_tpu.models.model import _merge_constraints


def test_constructor_input_kinds():
    # integers / lists are converted to float64 (constraints.jl:43-49)
    c = ct.Constraint([[1, 0], [0, 1]], [0, 0], ct.ZeroSet)
    assert c.A.dtype == np.float64 and c.b.dtype == np.float64
    # sparse A stays sparse
    c = ct.Constraint(sp.eye(3, format="csc"), np.zeros(3), ct.Nonnegatives)
    assert sp.issparse(c.A)
    # a row vector for a single-row constraint
    c = ct.Constraint(np.array([1.0, 2.0]), np.array([3.0]), ct.ZeroSet)
    assert c.A.shape == (1, 2)
    # a 1-D column for a multi-row constraint
    c = ct.Constraint(np.array([1.0, 2.0, 3.0]), np.zeros(3), ct.Nonnegatives)
    assert c.A.shape == (3, 1)


def test_constructor_mismatch_raises():
    with pytest.raises(ValueError):
        ct.Constraint(np.eye(3), np.zeros(2), ct.ZeroSet)
    with pytest.raises(ValueError):
        ct.Constraint(np.eye(3), np.zeros(3), ct.Nonnegatives(5))
    # Box and PowerCone need instantiated objects
    with pytest.raises(ValueError):
        ct.Constraint(np.eye(2), np.zeros(2), ct.Box)
    with pytest.raises(ValueError):
        ct.Constraint(np.eye(3), np.zeros(3), ct.PowerCone)


def test_index_embedding():
    """dim/indices embed a sub-range constraint into the full variable
    width (reference: constraint.jl:64-70, tested at constraints.jl:52-59)."""
    A = np.array([[1.0, 2.0], [3.0, 4.0]])
    b = np.zeros(2)
    c = ct.Constraint(A, b, ct.ZeroSet, dim=5, indices=[1, 3])
    Af = np.asarray(c.A.todense() if sp.issparse(c.A) else c.A)
    assert Af.shape == (2, 5)
    np.testing.assert_array_equal(Af[:, [1, 3]], A)
    assert np.all(Af[:, [0, 2, 4]] == 0)
    with pytest.raises(ValueError):
        ct.Constraint(A, b, ct.ZeroSet, dim=2, indices=[1, 3])


def test_merge_same_type_constraints():
    """Same-set-type constraints merge into one stacked constraint
    (reference: constraints.jl:62-90)."""
    c1 = ct.Constraint(np.eye(2), np.zeros(2), ct.Nonnegatives)
    c2 = ct.Constraint(2 * np.eye(2), np.ones(2), ct.Nonnegatives)
    merged = _merge_constraints([c1, c2])
    assert len(merged) == 1
    m = merged[0]
    assert type(m.convex_set) is ct.Nonnegatives and m.convex_set.dim == 4
    Af = np.asarray(m.A.todense() if sp.issparse(m.A) else m.A)
    np.testing.assert_array_equal(Af, np.vstack([np.eye(2), 2 * np.eye(2)]))
    np.testing.assert_array_equal(m.b, np.concatenate([np.zeros(2), np.ones(2)]))
    # different set types stay separate
    c3 = ct.Constraint(np.eye(2), np.zeros(2), ct.ZeroSet)
    assert len(_merge_constraints([c1, c3, c2])) == 2


def test_complex_hermitian_deduction():
    """A PsdConeTriangle row count that is r^2 (not a triangle number)
    deduces the complex Hermitian cone (reference: constraint.jl:98-103)."""
    rows = 9  # 3x3 Hermitian packed storage
    c = ct.Constraint(np.eye(rows), np.zeros(rows), ct.PsdConeTriangle)
    assert type(c.convex_set) is ct.PsdConeTriangleComplex
