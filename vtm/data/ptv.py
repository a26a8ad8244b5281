"""PTV dataset registry names (reference slowfast/datasets/ptv_datasets.py).

Functional parity target: /root/reference/slowfast/datasets/ptv_datasets.py
(Ptvkinetics :142-273, Ptvcharades :311-452, Ptvssv2 :454-595).

The reference's PTV variants load the SAME datasets as the native
Kinetics / Charades / SSv2 classes but through pytorchvideo's
``LabeledVideoDataset`` machinery (clip samplers + torchvision-style
transform stacks), wrapped back into the slowfast tuple contract by
``PTVDatasetWrapper`` (:42-91). pytorchvideo is not available in this
image, and the sampling semantics the wrappers reproduce — one random
clip per video with random crop/scale/flip for train/val, uniformly
spaced clips with center cropping for test — are exactly what the
native datasets already implement on the numpy/cv2 path. The registry
names are therefore aliases of the native datasets, so every reference
config that sets ``TRAIN/TEST.DATASET: ptvkinetics`` (etc.) builds and
yields the same (frames, label, index, meta) tuples.
"""

from __future__ import annotations

from vtm.data.charades import Charades
from vtm.data.kinetics import Kinetics
from vtm.data.loader import register_dataset
from vtm.data.ssv2 import Ssv2


@register_dataset("ptvkinetics")
class Ptvkinetics(Kinetics):
    """ptv_datasets.py:142-273 — see module docstring."""


@register_dataset("ptvcharades")
class Ptvcharades(Charades):
    """ptv_datasets.py:311-452 — see module docstring."""


@register_dataset("ptvssv2")
class Ptvssv2(Ssv2):
    """ptv_datasets.py:454-595 — see module docstring."""
