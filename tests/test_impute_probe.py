"""senna impute + probe tests."""

import numpy as np
import scipy.sparse as sp

from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.senna.impute import impute_counts, probe_latent


def test_impute_smooths_dropouts():
    rng = np.random.default_rng(0)
    d, n = 40, 200
    # two latent groups with distinct profiles
    group = np.arange(n) % 2
    rates = np.where(group[:, None] == 0, 5.0, 0.5) * np.ones((n, d))
    rates[:, : d // 2] = np.where(group[:, None] == 1, 5.0, 0.5)
    y = rng.poisson(rates).astype(np.float32)
    latent = np.stack([group + rng.normal(0, 0.05, n), rng.normal(0, 0.05, n)], 1)
    be = MemoryBackend(sp.csc_matrix(y.T))
    imp = impute_counts(be, latent.astype(np.float32), knn=10, cell_block=64)
    assert imp.shape == (n, d)
    # imputed values are smoother: per-group variance shrinks
    raw_var = y[group == 0].var(0).mean()
    imp_var = imp[group == 0].var(0).mean()
    assert imp_var < 0.5 * raw_var
    # group means preserved
    np.testing.assert_allclose(
        imp[group == 0].mean(0), y[group == 0].mean(0), rtol=0.25, atol=0.5
    )


def test_probe_flags_drift():
    rng = np.random.default_rng(1)
    train = rng.normal(0, 1, size=(500, 4)).astype(np.float32)
    same = rng.normal(0, 1, size=(200, 4)).astype(np.float32)
    shifted = same + 3.0
    v_ok = probe_latent(train, same)
    v_drift = probe_latent(train, shifted)
    assert v_ok.verdict == "ok"
    assert v_drift.verdict in ("drift", "novel")
    assert v_drift.drift_score > v_ok.drift_score
