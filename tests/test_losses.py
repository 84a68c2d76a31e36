"""Redescending / Cauchy loss parity with the reference formulas."""
import numpy as np

from acinoset_tpu.ops import losses


def np_func_step(start, x):
    return 1 / (1 + np.e ** (-1 * (x - start)))


def np_func_piece(start, end, x):
    return np_func_step(start, x) - np_func_step(end, x)


def np_redescending(err, a, b, c):
    # independent NumPy transcription of the reference formula
    # (src/build.py:388-395) used as the oracle
    e = abs(err)
    cost = 0.0
    cost += (1 - np_func_step(a, e)) / 2 * e**2
    cost += np_func_piece(a, b, e) * (a * e - (a**2) / 2)
    cost += np_func_piece(b, c, e) * (a * b - (a**2) / 2 + (a * (c - b) / 2) * (1 - ((c - e) / (c - b)) ** 2))
    cost += np_func_step(c, e) * (a * b - (a**2) / 2 + (a * (c - b) / 2))
    return cost


def test_redescending_matches_reference_formula():
    x = np.linspace(-40, 40, 801)
    ours = np.asarray(losses.redescending_loss(x, 3, 10, 20))
    ref = np_redescending(x, 3, 10, 20)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_redescending_shape_properties():
    a, b, c = 3.0, 10.0, 20.0
    x = np.linspace(0, 50, 2001)
    y = np.asarray(losses.redescending_loss(x, a, b, c))
    # approximately monotone (the sigmoid blending of the reference
    # formula introduces tiny dips near the knots) and saturating beyond c
    assert np.all(np.diff(y) >= -0.2)
    assert abs(y[-1] - y[np.searchsorted(x, c + 5)]) < 0.05
    # roughly quadratic in the inlier region (blending skews small values)
    mid = np.abs(x - 2.0).argmin()
    assert abs(y[mid] - 2.0) < 0.3


def test_irls_weights():
    a, b, c = 3.0, 10.0, 20.0
    w_small = float(losses.redescending_weight(np.array(1.0), a, b, c))
    assert abs(w_small - 1.0) < 1e-9
    w_mid = float(losses.redescending_weight(np.array(6.0), a, b, c))
    assert abs(w_mid - a / 6.0) < 1e-9
    w_far = float(losses.redescending_weight(np.array(25.0), a, b, c))
    assert w_far == 0.0
    # cauchy weight consistent with scipy's loss: rho'(e^2) where
    # rho(z) = f^2 ln(1 + z/f^2)
    e = 7.0
    f = 50.0
    assert abs(float(losses.cauchy_weight(np.array(e), f)) - 1 / (1 + (e / f) ** 2)) < 1e-12
