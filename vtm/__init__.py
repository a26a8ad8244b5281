"""vtm — "Video, How Do Your Tokens Merge?" rebuilt TPU-native.

A JAX/XLA/Pallas framework with the capabilities of the reference
`sjpollard/video-how-do-your-tokens-merge` (CVPRW 2025): training-free
spatio-temporal token merging (ToMe) applied to pretrained video
transformers (ViViT, VideoMAE, TimeSformer, Motionformer), plus token
drop / random / hybrid variants, evaluation, fine-tuning, benchmarking
and merge-source visualisation.

Unlike the reference (PyTorch monkey-patching, dynamic shapes), this
framework is designed TPU-first:
  - merge schedules are static per layer -> one XLA program, every layer
    compiled with its own (smaller) token count;
  - merging is a first-class layer in the model definition, not a patch;
  - data parallelism via `jax.sharding` meshes, not DDP/NCCL.
"""

__version__ = "0.1.0"

from vtm.merge import (  # noqa: F401
    bipartite_soft_matching,
    bipartite_soft_matching_drop,
    bipartite_soft_matching_hybrid,
    kth_bipartite_soft_matching,
    random_bipartite_soft_matching,
    merge_wavg,
    merge_source,
    parse_r,
)
