"""multiz_tpu — a TPU-native multiple-genome aligner (multiz/TBA capabilities).

A from-scratch JAX/XLA/Pallas re-design of the multiz/TBA toolkit
(Blanchette et al. 2004): progressive "align two alignments" multiple
alignment over a phylogenetic guide tree, with the banded column DP executed
as batched device kernels and the MAF algebra as a vectorized host layer.
"""

__version__ = "0.1.0"
