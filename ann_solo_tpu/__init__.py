"""ANN-SoLo-TPU: TPU-native open-modification spectral-library search.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ANN-SoLo
(bittremieux/ANN-SoLo): feature-hashed spectrum vectorization, IVF
approximate-nearest-neighbor candidate selection, exact shifted-dot-product
rescoring, cascade (standard -> open) searching, and semi-supervised
target-decoy FDR control -- all engineered for TPU hardware (MXU matmuls,
fused masks, on-device top-k, ICI-sharded libraries).
"""

__version__ = "0.1.0"
