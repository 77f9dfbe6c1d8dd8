"""Reference-parity checks for registry statistical tests whose oracle
shares formula text with the Spark side (a shared-text bug would pass
the hash gate): recompute from raw parquet with an independent numpy
implementation."""

import numpy as np
import pandas as pd
import pytest

from openseizuredatabase_spark.plans.registry import QUERIES


def _rankdata_average(x: np.ndarray) -> np.ndarray:
    """scipy.stats.rankdata(method='average') without scipy."""
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def _kruskal_h(groups: list[np.ndarray]) -> float:
    """Textbook tie-corrected Kruskal-Wallis H (Kruskal & Wallis 1952)."""
    all_v = np.concatenate(groups)
    n = len(all_v)
    ranks = _rankdata_average(all_v)
    h = 0.0
    start = 0
    for g in groups:
        r = ranks[start : start + len(g)]
        start += len(g)
        h += r.sum() ** 2 / len(g)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _, counts = np.unique(all_v, return_counts=True)
    tie = float((counts**3 - counts).sum())
    return h / (1.0 - tie / (n**3 - n))


def test_n29_matches_independent_numpy_kw(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["event_type", "value"]
    ].dropna()
    vc = np.round(pdf["value"].to_numpy() * 100).astype(np.int64)
    groups = [
        vc[(pdf["event_type"] == t).to_numpy()]
        for t in sorted(pdf["event_type"].unique())
    ]
    expected = _kruskal_h(groups)

    row = QUERIES["n29_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    assert row["n_total"] == len(vc)
    assert row["n_groups"] == len(groups)
    # milli-unit quantization of the per-group terms bounds the H error
    # far below 1e-3 at this n; compare to the unquantized textbook value
    assert row["h_stat"] == pytest.approx(expected, abs=1e-3)


def test_n30_mood_median_independent_numpy(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["event_type", "value"]
    ].dropna()
    vc = np.round(pdf["value"].to_numpy() * 100).astype(np.int64)
    # lower median: smallest v with cum >= ceil(N/2)
    sv = np.sort(vc)
    m = sv[(len(sv) + 1) // 2 - 1]
    rows = QUERIES["n30_mood_median"].fn(spark, sf_dir).collect()
    for r in rows:
        g = vc[(pdf["event_type"] == r["event_type"]).to_numpy()]
        a = int((g > m).sum())
        assert r["a_g"] == a and r["n_g"] == len(g)
        n, na = len(vc), int((vc > m).sum())
        ad_bc = a * (n - na) - (len(g) - a) * na
        chi2 = n * ad_bc**2 / (na * (n - na) * len(g) * (n - len(g)))
        assert r["chi2_vs_rest"] == pytest.approx(chi2, abs=1e-5)


def test_m44_learning_curve_shape(spark, sf_dir):
    rows = sorted(
        QUERIES["m44_learning_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r["s"],
    )
    assert [r["s"] for r in rows] == [5, 20, 40, 80]
    # nested subsets: training size strictly grows, held-out set fixed
    sizes = [r["n_train"] for r in rows]
    assert sizes == sorted(sizes) and sizes[0] < sizes[-1]
    assert len({r["n_test"] for r in rows}) == 1
    for r in rows:
        assert 0 <= r["acc_micro"] <= 1000000
        assert r["n_correct"] <= r["n_test"]


def _daily_series(sf_dir: str) -> dict[str, np.ndarray]:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "ts"]]
    ev["d"] = ev["ts"].dt.floor("D")
    days = sorted(ev["d"].unique())[:30]
    out = {}
    for t in sorted(ev["event_type"].unique()):
        g = ev[ev["event_type"] == t].groupby("d").size()
        out[t] = np.array([int(g.get(d, 0)) for d in days], dtype=np.int64)
    return out


def _dtw_band(a: np.ndarray, b: np.ndarray, r: int = 3) -> int:
    """Independent full-matrix banded DTW (band cells INF-masked)."""
    k = len(a)
    inf = 1 << 60
    dp = np.full((k + 1, k + 1), inf, dtype=np.int64)
    for i in range(1, k + 1):
        for j in range(1, k + 1):
            if abs(i - j) > r:
                continue
            c = abs(int(a[i - 1]) - int(b[j - 1]))
            if i == 1 and j == 1:
                dp[1, 1] = c
                continue
            best = min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1])
            if best < inf:
                dp[i, j] = best + c
    return int(dp[k, k])


def test_w29_dtw_matches_independent_numpy(spark, sf_dir):
    series = _daily_series(sf_dir)
    rows = QUERIES["w29_dtw_band"].fn(spark, sf_dir).collect()
    assert len(rows) == len(series) * (len(series) - 1) // 2
    for r in rows:
        expected = _dtw_band(series[r["ta"]], series[r["tb"]])
        assert r["dtw_dist"] == expected, (r["ta"], r["tb"])
    # identity and symmetry of the underlying kernel
    any_s = next(iter(series.values()))
    assert _dtw_band(any_s, any_s) == 0


def test_w30_matrix_profile_matches_independent_numpy(spark, sf_dir):
    series = _daily_series(sf_dir)
    m, excl = 7, 4
    rows = QUERIES["w30_matrix_profile"].fn(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["t"], []).append(r)
    for t, rs in by_type.items():
        a = series[t]
        n_win = len(a) - m + 1
        assert sorted(r["s"] for r in rs) == list(range(1, n_win + 1))
        mps = {}
        for i in range(n_win):
            best, bestj = None, None
            for j in range(n_win):
                if abs(i - j) < excl:
                    continue
                d = int(((a[i : i + m] - a[j : j + m]) ** 2).sum())
                if best is None or d < best or (d == best and j < bestj):
                    best, bestj = d, j
            mps[i + 1] = (best, bestj + 1)
        discord = max(mps.values())[0]
        for r in rs:
            eb, ej = mps[r["s"]]
            assert r["mp_d2"] == eb and r["nn_s"] == ej, (t, r["s"])
            assert r["is_discord"] == (eb == discord)
