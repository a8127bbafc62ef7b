"""Feature coarsening: gene -> meta-feature aggregation
(data-beans-alg `feature_coarsening.rs` equivalent).

Coarse groups come from binary-sorting the features by their [D, S]
pseudobulk profiles (the same rSVD sign-code machinery as cell
sorting, feature_coarsening.rs:88-140). Aggregations are one-hot
segment sums on device; the log-dictionary expansion divides coarse
mass uniformly within a group (expand_log_dict_dk:54, the `- ln(g)`
correction).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from . import random_projection as rp


@dataclass
class FeatureCoarsening:
    fine_to_coarse: np.ndarray  # [D] group index per feature
    num_coarse: int

    def aggregate_columns_nd(self, data_nd: np.ndarray) -> np.ndarray:
        """[N, D] -> [N, d] by summing features within groups."""
        import jax

        f2c = jnp.asarray(self.fine_to_coarse.astype(np.int32))
        out = jax.ops.segment_sum(
            jnp.asarray(data_nd).T, f2c, num_segments=self.num_coarse
        ).T
        return np.asarray(out)

    def aggregate_rows_ds(self, data_ds: np.ndarray) -> np.ndarray:
        """[D, S] -> [d, S]."""
        import jax

        f2c = jnp.asarray(self.fine_to_coarse.astype(np.int32))
        return np.asarray(
            jax.ops.segment_sum(jnp.asarray(data_ds), f2c, num_segments=self.num_coarse)
        )

    def expand_log_dict_dk(self, log_dict_ck: np.ndarray) -> np.ndarray:
        """[d, K] coarse log-dictionary -> [D, K]: fine feature f in a
        group of size g gets coarse[c] - ln(g)."""
        sizes = np.bincount(self.fine_to_coarse, minlength=self.num_coarse)
        out = np.asarray(log_dict_ck)[self.fine_to_coarse]
        return out - np.log(np.maximum(sizes[self.fine_to_coarse], 1))[:, None]

    def group_sizes(self) -> np.ndarray:
        return np.bincount(self.fine_to_coarse, minlength=self.num_coarse)


def compute_feature_coarsening(
    profile_ds: np.ndarray, max_features: int, *, seed: int = 0
) -> FeatureCoarsening:
    """Group D features into <= ~max_features by binary-sorting their
    [S]-dim pseudobulk profiles (feature_coarsening.rs:88-140)."""
    d, s = profile_ds.shape
    if max_features >= d:
        return FeatureCoarsening(fine_to_coarse=np.arange(d), num_coarse=d)
    sort_dim = min(int(np.ceil(np.log2(max(max_features, 2)))), s)
    # binary_sort_columns sorts COLUMNS of an [S, D] "projection"
    codes = rp.binary_sort_columns(
        np.asarray(profile_ds, np.float32).T.copy(), sort_dim, seed=seed
    )
    groups, num = rp.compact_group_codes(codes)
    return FeatureCoarsening(fine_to_coarse=groups.astype(np.int64), num_coarse=num)
