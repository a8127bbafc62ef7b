"""legume-tpu: a TPU-native single-cell genomics analysis engine.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
`legume-rs` Rust workspace (sparse count-matrix storage + neighborhood
search, stochastic variational topic/factor embedding, counterfactual
confounder-adjusted differential expression, spatial link communities,
BAM feature extraction, eQTL/GWAS fine-mapping) re-designed TPU-first:

- device compute is jitted JAX over a `jax.sharding.Mesh` (cells
  data-parallel, genes replicated or sharded where separable),
- sparse cell blocks live as padded COO buckets so shapes stay static,
- pseudobulk coarsening keeps dense training at O(P x D), P << N,
- host I/O is zarr-v3 (tensorstore) / HDF5 with the same on-disk group
  layout as the reference (`data-beans/README.md:5-20`).

Subpackages mirror the reference's layer map (SURVEY.md section 1):

- ``legume_tpu.data``   : data-beans equivalent (storage, visitors, QC, sim)
- ``legume_tpu.ops``    : matrix-util + data-beans-alg equivalent
  (Gamma params, projection, collapse, kNN, HVG, transforms)
- ``legume_tpu.models`` : candle-util equivalent (encoders, decoders,
  losses, trainers, SGVB)
- ``legume_tpu.parallel``: mesh/sharding layer (new capability; the
  reference is single-node, SURVEY.md section 2.7)
- ``legume_tpu.cli``    : application binaries (senna, cocoa, pinto, ...)
"""

__version__ = "0.1.0"
