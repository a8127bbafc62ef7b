"""Chunked epoch folding — the shared SGD dispatch pattern.

Every dense training loop in the package (NCE phase 1, gem,
gem-encoder, fne, the masked trainer) folds its epochs into
`lax.scan` chunks so one device dispatch covers many epochs: per-epoch
dispatch costs ~85 ms over a tunneled TPU and a per-epoch scalar
readback forces a device sync.  Two invariants every caller relies on:

- the data pytree rides as a jit ARGUMENT, never a closure constant —
  closed-over arrays are baked into the compiled program (a 357 MB
  payload at the NCE anchor shape; the tunnel's compile endpoint
  rejects it);
- chunks are a fixed size (default 100) so the jit cache sees at most
  two program shapes (full chunk + remainder).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import numpy as np

StepFn = Callable[[Any, Any, Any], tuple[Any, Any]]

# cross-call runner cache: a fresh `_run` closure per fold_epochs call
# means every fit_* invocation re-traces and re-loads the compiled
# program (measured ~3 s/call over the tunneled TPU even with the
# persistent compile cache warm). Callers whose step_fn is fully
# determined by a hashable key pass `cache_key` to reuse the first
# call's jitted runner — the CALLER owns the contract that two step_fns
# with the same key compute the same function (shapes/dtypes still
# retrace inside jit as usual).
_RUN_CACHE: dict = {}


def fold_epochs(
    step_fn: StepFn,
    carry: Any,
    data: Any,
    n_epochs: int,
    *,
    key: Optional[jax.Array] = None,
    chunk: int = 100,
    cache_key: Optional[tuple] = None,
) -> tuple[Any, np.ndarray]:
    """Run `step_fn(carry, data, key_or_None) -> (carry, loss)` for
    `n_epochs` epochs in chunked jitted scans.

    When `key` is given each epoch receives its own split key; pass
    None for deterministic full-batch steps.  Returns the final carry
    and the full per-epoch loss trace as a numpy array (the caller
    subsamples)."""

    def _make_run():
        @partial(jax.jit, static_argnames=("n",))
        def _run(carry, data, keys, *, n):
            def body(c, x):
                return step_fn(c, data, x)

            if keys is None:
                return jax.lax.scan(body, carry, None, length=n)
            return jax.lax.scan(body, carry, keys)

        return _run

    if cache_key is not None:
        _run = _RUN_CACHE.get(cache_key)
        if _run is None:
            _run = _RUN_CACHE.setdefault(cache_key, _make_run())
    else:
        _run = _make_run()

    losses = []
    done = 0
    while done < n_epochs:
        n_e = min(chunk, n_epochs - done)
        if key is None:
            keys = None
        else:
            key, kc = jax.random.split(key)
            keys = jax.random.split(kc, n_e)
        carry, ls = _run(carry, data, keys, n=n_e)
        losses.append(np.asarray(ls))
        done += n_e
    return carry, (
        np.concatenate(losses) if losses else np.zeros(0, np.float32)
    )
