"""Natural cubic spline evaluation for OpenSim coordinate-coupling
functions (SimmSpline / NaturalCubicSpline on CustomJoint TransformAxes).

Parity surface: nimble's readSkel consumes the full OpenSim model,
including coupled-coordinate transform functions such as the Rajagopal
walker-knee translation splines (reference AddBiomechanicsDataset.py:127
via nimblephysics; model files ship SimmSpline knots). This module gives
the TPU skeleton kernels (ops/skeleton.py) an autodiff-friendly
evaluator:

- Knot abscissae ``x`` are STRUCTURAL (baked at trace time as numpy).
- Ordinates ``y`` may be traced arrays (per-subject scaled models scale
  the translation knots), because the natural-cubic second-derivative
  vector is LINEAR in ``y``: M = S @ y with S precomputed from ``x``
  alone (tridiagonal solve folded into a dense [K,K] matrix — K is tiny,
  ~5-20 knots).
- Queries outside the knot range evaluate the clamped end segment's
  cubic (SimmSpline extrapolates smoothly off the ends; for the natural
  boundary condition M=0 the end cubic is near-linear, and parity tests
  only exercise in-range coordinates).

``jax.grad`` flows through the piecewise polynomial exactly (the segment
index is piecewise-constant, so the derivative is the segment
polynomial's — correct everywhere except exactly at knots, measure zero).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def natural_cubic_second_derivative_matrix(x: np.ndarray) -> np.ndarray:
    """S such that the natural-cubic second derivatives are M = S @ y.

    Standard tridiagonal system: for interior knots i=1..K-2,
      (h[i-1]/6) M[i-1] + ((h[i-1]+h[i])/3) M[i] + (h[i]/6) M[i+1]
        = (y[i+1]-y[i])/h[i] - (y[i]-y[i-1])/h[i-1]
    with natural boundaries M[0] = M[K-1] = 0.
    """
    x = np.asarray(x, np.float64)
    k = len(x)
    if k < 2:
        raise ValueError('spline needs at least 2 knots')
    if np.any(np.diff(x) <= 0):
        raise ValueError('spline knots must be strictly increasing')
    if k == 2:
        return np.zeros((2, 2))
    h = np.diff(x)
    A = np.zeros((k, k))
    B = np.zeros((k, k))
    A[0, 0] = 1.0
    A[-1, -1] = 1.0
    for i in range(1, k - 1):
        A[i, i - 1] = h[i - 1] / 6.0
        A[i, i] = (h[i - 1] + h[i]) / 3.0
        A[i, i + 1] = h[i] / 6.0
        B[i, i - 1] = 1.0 / h[i - 1]
        B[i, i] = -1.0 / h[i - 1] - 1.0 / h[i]
        B[i, i + 1] = 1.0 / h[i]
    return np.linalg.solve(A, B)


class NaturalCubicSpline:
    """Precompiled spline: structural knots ``x``, traceable ``y``."""

    def __init__(self, x, y=None):
        self.x = np.asarray(x, np.float64)
        self.S = natural_cubic_second_derivative_matrix(self.x)
        self.y = None if y is None else np.asarray(y, np.float64)

    def __call__(self, q, y=None):
        """Evaluate at scalar (or array) ``q``. ``y`` overrides the knot
        ordinates (e.g. a traced per-subject array)."""
        if y is None:
            if self.y is None:
                raise ValueError('no y knots bound')
            y = self.y
        y = jnp.asarray(y)
        x = jnp.asarray(self.x, y.dtype)
        S = jnp.asarray(self.S, y.dtype)
        M = S @ y
        # segment index: i such that x[i] <= q < x[i+1], clamped to ends
        i = jnp.clip(jnp.searchsorted(x, q, side='right') - 1, 0,
                     len(self.x) - 2)
        h = x[i + 1] - x[i]
        a = (x[i + 1] - q) / h
        b = (q - x[i]) / h
        return (a * y[i] + b * y[i + 1]
                + ((a ** 3 - a) * M[i] + (b ** 3 - b) * M[i + 1])
                * (h * h) / 6.0)
