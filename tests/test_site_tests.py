"""faba site-test statistics vs scipy ground truth."""

import numpy as np
from scipy.stats import binom

from legume_tpu.faba.site_tests import (
    betabinom_pvalue_greater,
    contrast_sites,
    fisher_exact_greater,
    log_odds_ratio,
)


def test_betabinom_binomial_limit():
    # rho = 0 reduces to the exact binomial upper tail
    p = betabinom_pvalue_greater(np.asarray([5]), np.asarray([100]), 0.01, 0.0)
    want = binom.sf(4, 100, 0.01)
    np.testing.assert_allclose(p, want, rtol=1e-4)


def test_betabinom_overdispersion_inflates_tail():
    p0 = betabinom_pvalue_greater(np.asarray([8]), np.asarray([100]), 0.01, 0.0)
    p1 = betabinom_pvalue_greater(np.asarray([8]), np.asarray([100]), 0.01, 0.2)
    assert p1 > p0  # overdispersed null explains more extremes


def test_betabinom_edge_cases():
    assert betabinom_pvalue_greater(np.asarray([0]), np.asarray([50]), 0.01, 0.1) == 1.0
    assert betabinom_pvalue_greater(np.asarray([5]), np.asarray([0]), 0.01, 0.1) == 1.0


def test_fisher_exact_direction():
    # strong editing in WT vs none in control -> small p
    p = fisher_exact_greater(20, 80, 1, 99)
    assert p < 1e-3
    # reversed -> large p
    p2 = fisher_exact_greater(1, 99, 20, 80)
    assert p2 > 0.99


def test_log_odds_ratio_sign():
    assert log_odds_ratio(20, 80, 1, 99) > 0
    assert log_odds_ratio(1, 99, 20, 80) < 0


def test_contrast_sites_vectorized():
    alt_wt = np.asarray([15, 1])
    ref_wt = np.asarray([85, 99])
    alt_c = np.asarray([1, 1])
    ref_c = np.asarray([99, 99])
    out = contrast_sites(alt_wt, ref_wt, alt_c, ref_c)
    assert out["pvalue_fisher"][0] < 0.01  # true site
    assert out["pvalue_fisher"][1] > 0.4  # null site
    assert out["log_odds_ratio"][0] > 1.0
