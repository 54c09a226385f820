"""Scale-path operators.

``native`` re-expresses DDSketch construction/aggregation/quantile extraction
as pure Catalyst expressions (whole-stage codegen, partial aggregation, no
Python in the hot path). The remaining modules are the beyond-reference
training-data-pipeline operators: deduplication, similarity search,
matrix decomposition (PCA/Gram/Mahalanobis), text analysis, and
multimodal column plumbing.
"""
