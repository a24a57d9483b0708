"""starneig_tpu — a TPU-native dense nonsymmetric eigenvalue framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
NLAFET/StarNEig (reference: /root/reference): the complete solve chain for
dense nonsymmetric standard (SEP: A v = lambda v) and generalized
(GEP: A v = lambda B v) eigenvalue problems:

  1. Hessenberg(-triangular) reduction
  2. Multishift QR/QZ Schur reduction with aggressive early deflation (AED)
  3. Eigenvalue reordering (deflating subspaces)
  4. Robust, overflow-protected eigenvector back-substitution

The reference's StarPU task DAG / CUDA / MPI stack is replaced by an
idiomatic TPU design: windowed work (bulge chasing, AED, reordering
windows) runs as jitted fixed-shape kernels; trailing updates are large
GEMMs on the MXU; multi-chip runs shard the matrices over a
``jax.sharding.Mesh`` with XLA collectives.

Public API parity map (reference header -> here):
  starneig/sep_sm.h      -> starneig_tpu.api.sep   (SM = single-process)
  starneig/gep_sm.h      -> starneig_tpu.api.gep
  starneig/sep_dm.h      -> starneig_tpu.api.sep_dm
  starneig/gep_dm.h      -> starneig_tpu.api.gep_dm
  starneig/node.h        -> starneig_tpu.node
  starneig/expert.h      -> starneig_tpu.config
  starneig/error.h       -> starneig_tpu.errors
  starneig/distr_matrix.h-> starneig_tpu.parallel.distr_matrix
"""

from starneig_tpu import config, errors
from starneig_tpu.node import node_init, node_finalize, node_initialized

__version__ = "0.1.0"

__all__ = [
    "config",
    "errors",
    "node_init",
    "node_finalize",
    "node_initialized",
]
