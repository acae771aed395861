"""TPU-native point-cloud / calorimeter-shower classification framework.

A from-scratch JAX/Flax/Pallas rebuild with the capabilities of
``jakobblaabjerg/point-cloud-classifier``: HDF5 shower ingestion, three
dataset representations (tabular / point cloud / lineage graph), four model
families (logistic regression, MLP, DeepSets, message-passing graph net), a
single jit-compiled train step with best-checkpoint selection and early
stopping, data-parallel execution over a ``jax.sharding.Mesh``, and a
hyperparameter sweep driver.

Public subpackages
------------------
- ``data``     — offline preprocessing + static-shape bucketed batch iterators
- ``models``   — Flax modules and the JAX logistic regression
- ``ops``      — segment reductions, masked batch norm, Pallas TPU kernels
- ``parallel`` — mesh construction and sharded train steps
- ``utils``    — config overlay system, run logger, plots
"""

__version__ = "0.1.0"

from point_cloud_classifier_tpu.utils.jit_cache import maybe_enable_from_env as _cc

# honor PCC_COMPILE_CACHE before any jit compilation (no-op when unset;
# does not import jax unless enabled)
_cc()
del _cc
