"""Statistical kernels with no external dependency.

The reference's ensemble predictor (user_tools/nnTraining2/
ensemblePredictor.py:27-66) combines per-fold model scores with the
Harrell-Davis quantile estimator, whose order-statistic weights are beta
CDF differences. scipy is absent in this environment, so the regularized
incomplete beta function is implemented directly (Lentz's continued
fraction, the standard numerically-stable evaluation); an integer-order
binomial-sum identity pins it in tests.

These run DRIVER-SIDE only: for a fixed ensemble size n and quantile q
the n weights are constants, so they are computed once and embedded as
literals in the distributed plan — never per row.
"""

from __future__ import annotations

from math import exp, lgamma, log


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's algorithm)."""
    tiny = 1e-30
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 3e-15:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) — the Beta(a, b) CDF at x."""
    if a <= 0 or b <= 0:
        raise ValueError("betainc_reg requires a > 0 and b > 0")
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        lgamma(a + b) - lgamma(a) - lgamma(b) + a * log(x) + b * log(1.0 - x)
    )
    bt = exp(ln_bt)
    # symmetry switch keeps the continued fraction in its fast region
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def harrell_davis_weights(n: int, quantile: float) -> list[float]:
    """Order-statistic weights of the Harrell-Davis quantile estimator.

    w_i = I_{(i+1)/n}(a, b) - I_{i/n}(a, b) with a = (n+1)q,
    b = (n+1)(1-q) — exactly the reference's weighting
    (ensemblePredictor.py:46-66). The estimate is then
    sum_i w_i * sorted_values[i]; the weights sum to 1.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    a = (n + 1) * quantile
    b = (n + 1) * (1.0 - quantile)
    edges = [betainc_reg(a, b, i / n) for i in range(n + 1)]
    return [edges[i + 1] - edges[i] for i in range(n)]
