"""Power-law fitting (Clauset-Shalizi-Newman) over a DataFrame column.

Reference: igraph_power_law_fit (/root/reference/src/other.c:246),
which wraps the bundled plfit library (/root/reference/src/plfit/):
continuous/discrete MLE alpha, optional automatic xmin by minimizing
the Kolmogorov-Smirnov statistic over the distinct sample values
(plfit.c:286,754), KS p-value via the one-sample Kolmogorov formula
(kolmogorov.c:23), finite-size alpha correction for n < 50
(plfit.c:118).

Spark-first scale shape: the only distributed pass is a
``groupBy(value).count()`` — 100 TB of raw samples (e.g. the degree
column of a 10^12-vertex graph) compact to one histogram row per
DISTINCT value, which for degree-like heavy-tailed data is O(sqrt(m))
rows.  The CSN scan over candidate xmins then runs vectorized in
numpy on that compacted histogram (exact — every tail statistic the
method needs is a suffix aggregate of the histogram), never touching
the raw rows again.  This mirrors how plfit pre-sorts once and scans;
here the "sort" is the histogram groupBy.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

__all__ = ["power_law_fit", "hurwitz_zeta", "kolmogorov_p"]

# Bernoulli-term coefficients for the Euler-Maclaurin tail of the
# Hurwitz zeta series: B_2/2! = 1/12, B_4/4! = -1/720, B_6/6! = 1/30240
_EM_COEF = (1.0 / 12, -1.0 / 720, 1.0 / 30240)


def hurwitz_zeta(alpha: float, q) -> np.ndarray:
    """zeta(alpha, q) = sum_{k>=0} (q+k)^-alpha for alpha > 1, q > 0,
    vectorized over ``q`` (Euler-Maclaurin, abs err ~1e-12 — the same
    quantity plfit takes from GSL's gsl_sf_hzeta)."""
    q = np.asarray(q, dtype=np.float64)
    # shift the series start N terms out so q+N >= 18 everywhere
    n_shift = np.maximum(0, np.ceil(18.0 - q)).astype(np.int64)
    max_shift = int(n_shift.max()) if n_shift.size else 0
    ks = np.arange(max_shift, dtype=np.float64)
    # partial sum of the first n_shift terms, per element
    terms = np.where(ks[None, :] < n_shift[:, None],
                     np.power(q[:, None] + ks[None, :], -alpha), 0.0)
    head = terms.sum(axis=1)
    a = q + n_shift
    tail = (np.power(a, 1.0 - alpha) / (alpha - 1.0)
            + 0.5 * np.power(a, -alpha))
    corr = np.zeros_like(a)
    fact = alpha
    pw = np.power(a, -alpha - 1.0)
    for i, c in enumerate(_EM_COEF):
        corr += c * fact * pw
        # next odd derivative factor: alpha(alpha+1)...(alpha+2i+2)
        fact *= (alpha + 2 * i + 1) * (alpha + 2 * i + 2)
        pw /= a * a
    return head + tail + corr


def kolmogorov_p(d: float, n: int) -> float:
    """One-sample KS p-value Q(d * sqrt(n)) — same series as plfit's
    plfit_kolmogorov (kolmogorov.c:23)."""
    u = abs(d) * math.sqrt(n)
    if u < 0.2:
        return 1.0
    if u < 0.755:
        v = 1.0 / (u * u)
        w = 2.50662827
        return 1.0 - w * (math.exp(-1.2337005501361697 * v)
                          + math.exp(-11.103304951225528 * v)
                          + math.exp(-30.842513753404244 * v)) / u
    if u < 6.8116:
        v = u * u
        maxj = max(1, int(3.0 / u + 0.5))
        r = [math.exp(fj * v) for fj in (-2.0, -8.0, -18.0, -32.0)[:maxj]]
        return 2.0 * sum((-1) ** j * rj for j, rj in enumerate(r))
    return 0.0


def _alpha_continuous(logsum_ratio: float, n: int) -> float:
    """MLE: alpha = 1 + n / sum(ln(x/xmin)) (plfit.c, CSN eq. 3.1)."""
    return 1.0 + n / logsum_ratio


def _ks_continuous(xs, counts, cum_below, n, alpha, xmin) -> float:
    """max |1-(xmin/x)^(alpha-1) - m/n| with m evaluated at both ends
    of each tie block (plfit_i_ks_test_continuous walks every sample;
    on a histogram the extremum over a block is at its endpoints)."""
    fitted = 1.0 - np.power(xmin / xs, alpha - 1.0)
    lo = np.abs(fitted - cum_below / n)
    hi = np.abs(fitted - (cum_below + counts - 1) / n)
    return float(np.maximum(lo, hi).max())


def _ks_discrete(xs, cum_below, n, alpha, xmin) -> float:
    """max |1 - zeta(alpha,x)/zeta(alpha,xmin) - m/n|, m = count of
    samples strictly below the tie block (plfit_i_ks_test_discrete)."""
    hz = hurwitz_zeta(alpha, np.concatenate(([xmin], xs)))
    fitted = 1.0 - hz[1:] / hz[0]
    return float(np.abs(fitted - cum_below / n).max())


def _alpha_discrete(xs, counts, n, xmin, logsum: float,
                    lo: float = 1.01, hi: float = 8.0,
                    tol: float = 1e-7) -> tuple[float, float]:
    """Golden-section maximization of the discrete log-likelihood
    L(alpha) = -alpha * sum(ln x) - n * ln zeta(alpha, xmin)
    (plfit_log_likelihood_discrete; unimodal in alpha)."""
    def nll(a: float) -> float:
        return a * logsum + n * math.log(
            float(hurwitz_zeta(a, np.array([xmin]))[0]))

    invphi = (math.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c, d = b - invphi * (b - a), a + invphi * (b - a)
    fc, fd = nll(c), nll(d)
    while b - a > tol:
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - invphi * (b - a)
            fc = nll(c)
        else:
            a, c, fc = c, d, fd
            d = a + invphi * (b - a)
            fd = nll(d)
    alpha = 0.5 * (a + b)
    return alpha, -nll(alpha)


def power_law_fit(data: DataFrame, col: str = "value",
                  xmin: float | None = None,
                  force_continuous: bool = False,
                  max_xmin_candidates: int = 1000) -> dict:
    """Fit P(x) ~ x^-alpha to the samples in ``data[col]`` ->
    {"continuous", "alpha", "xmin", "L", "D", "p", "n_tail"}.

    Semantics follow igraph_power_law_fit (other.c:246): discrete fit
    when every sample is integral (unless ``force_continuous``); alpha
    by MLE (closed form continuous, likelihood maximization discrete);
    ``xmin=None`` scans the distinct sample values and keeps the one
    minimizing the KS statistic D (plfit_continuous / plfit_discrete);
    finite-size correction alpha <- alpha*(m-1)/m + 1/m (m = tail
    size, plfit.c:118) applied when the TOTAL sample count is < 50
    (other.c:321 gates on n, not the tail), with L recomputed from the
    corrected alpha (plfit.c:258-262 corrects before computing L);
    p = Q(D*sqrt(n_tail)).

    ``max_xmin_candidates`` bounds the discrete scan (each candidate
    costs a golden-section zeta optimization): above it the candidates
    are an evenly-rank-spaced subset of the distinct values — the
    histogram itself is always exact.
    """
    hist = (data.select(F.col(col).cast("double").alias("x"))
            .where(F.col("x") > 0)
            .groupBy("x").agg(F.count("*").alias("c"))
            .orderBy("x").toPandas())
    if len(hist) == 0:
        raise ValueError("power_law_fit: no positive samples")
    xs_all = hist["x"].to_numpy(np.float64)
    cs_all = hist["c"].to_numpy(np.int64)
    discrete = (not force_continuous
                and bool(np.all(xs_all == np.floor(xs_all))))

    def fit_at(xm: float) -> tuple[float, float, float, int]:
        """-> (alpha, D, L, n_tail) for one xmin."""
        mask = xs_all >= xm
        xs, cs = xs_all[mask], cs_all[mask]
        n = int(cs.sum())
        cum_below = np.concatenate(([0], np.cumsum(cs)[:-1]))
        logsum = float((cs * np.log(xs)).sum())
        if discrete:
            alpha, ll = _alpha_discrete(xs, cs, n, xm, logsum)
            d = _ks_discrete(xs, cum_below, n, alpha, xm)
        else:
            lr = logsum - n * math.log(xm)
            if lr <= 0:  # every tail sample == xmin: no slope information
                return math.inf, math.inf, -math.inf, n
            alpha = _alpha_continuous(lr, n)
            ll = (n * math.log((alpha - 1.0) / xm)
                  - alpha * lr)  # L = m ln c - alpha sum ln(x/xmin)
            d = _ks_continuous(xs, cs, cum_below, n, alpha, xm)
        return alpha, d, ll, n

    if xmin is not None and xmin > 0:
        best_xmin = float(xmin) if not discrete else max(1.0, float(xmin))
        alpha, d, ll, n_tail = fit_at(best_xmin)
    else:
        # candidate xmins = distinct values with a tail of >= 2 samples
        tail_counts = cs_all[::-1].cumsum()[::-1]
        cand = xs_all[tail_counts >= 2]
        if len(cand) > max_xmin_candidates:
            idx = np.linspace(0, len(cand) - 1,
                              max_xmin_candidates).astype(np.int64)
            cand = np.unique(cand[idx])
        best = None
        for xm in cand:
            alpha, d, ll, n = fit_at(float(xm))
            if best is None or d < best[1]:
                best = (alpha, d, ll, n, float(xm))
        alpha, d, ll, n_tail, best_xmin = best

    # igraph gates the correction on the TOTAL sample count (other.c:321
    # `finite_size_correction = (n < 50)`), while the correction formula
    # itself uses the tail size (plfit.c:118); plfit then recomputes the
    # log-likelihood from the CORRECTED alpha (plfit.c:258-262).
    if int(cs_all.sum()) < 50:
        alpha = alpha * (n_tail - 1) / n_tail + 1.0 / n_tail
        mask = xs_all >= best_xmin
        xs_t, cs_t = xs_all[mask], cs_all[mask]
        logsum = float((cs_t * np.log(xs_t)).sum())
        if discrete:
            ll = -(alpha * logsum + n_tail * math.log(
                float(hurwitz_zeta(alpha, np.array([best_xmin]))[0])))
        else:
            lr = logsum - n_tail * math.log(best_xmin)
            ll = n_tail * math.log((alpha - 1.0) / best_xmin) - alpha * lr
    return {"continuous": not discrete, "alpha": float(alpha),
            "xmin": float(best_xmin), "L": float(ll), "D": float(d),
            "p": kolmogorov_p(d, n_tail), "n_tail": int(n_tail)}
