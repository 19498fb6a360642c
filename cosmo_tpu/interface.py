"""One-call functional entry point (SCS-style).

``solve(P, q, A, b, cone, **settings)`` mirrors the data format used by the
reference's python wrapper (reference: src/interface.jl:253-366): the
problem is ``min 1/2 x'Px + q'x  s.t.  Ax + s = b, s in K`` with the cone
described by a dict:

    {"f": #zero rows, "l": #nonneg rows, "q": [soc dims],
     "s": [psd triangle dims], "ep": #exp, "ed": #dual exp,
     "p": [power exponents, negative = dual], "b": #box rows (bounds l, u)}

CVXPY users can feed the solver through the SCS canonicalization:

    data, chain, inv = problem.get_problem_data(cp.SCS)
    # data["A"], data["b"], data["c"] (+ optional data["P"]) and the cone
    # dims map directly onto this call.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp

from .models.model import Model, cone_sets_from_dict
from .results import Result
from .settings import Settings


def solve(P, q, A, b, cone: dict, l=None, u=None,
          settings: Optional[Settings] = None, **kwargs) -> Result:
    """Solve ``min 1/2 x'Px + q'x s.t. Ax + s = b, s in K`` in one call.

    ``P`` may be None (LP/conic-linear). Extra keyword arguments are
    settings fields (e.g. ``eps_abs=1e-6, decompose=False``).
    """
    q = np.asarray(q, dtype=np.float64).ravel()
    n = q.shape[0]
    if P is None:
        P = sp.csr_matrix((n, n)) if sp.issparse(A) else np.zeros((n, n))
    if settings is None:
        settings = Settings(**kwargs)
    elif kwargs:
        settings = settings.replace(**kwargs)
    model = Model(settings)
    model.set(P, q, A, b, cone_sets_from_dict(cone, l, u))
    return model.optimize()
