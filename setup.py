#!/usr/bin/env python3
"""Packaging for the vtm framework (reference ships a setup.py for its
`tome` package — /root/reference/setup.py; this covers the whole
TPU-native rebuild: the vtm library plus the tools/ CLI scripts)."""

from setuptools import find_packages, setup

setup(
    name="vtm",
    version="0.4.0",
    description=(
        "TPU-native (JAX/Pallas) video token merging framework — "
        "ToMe for video transformers with the PySlowFast-style "
        "train/eval/benchmark harness"
    ),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "einops",
        "numpy",
        "pillow",
        "opencv-python",
        "pandas",
        "pyyaml",
        "yacs",
        "simplejson",
        # core eval/data paths import these at run time: multi-label mAP
        # (vtm/eval/meters.py get_map) and SSL Gaussian blur
        # (vtm/data/transform.py gaussian_blur_video)
        "scikit-learn",
        "scipy",
    ],
    extras_require={
        # torch is only needed to import reference .pyth checkpoints
        "convert": ["torch"],
        "tensorboard": ["tensorboard", "matplotlib"],
        # demo_net / video_visualizer colormaps
        "demo": ["matplotlib"],
        "wandb": ["wandb"],
    },
    packages=find_packages(include=("vtm", "vtm.*")),
    scripts=[
        "tools/run_net.py",
        "tools/test_net.py",
        "tools/train_net.py",
        "tools/model_benchmark.py",
        "tools/benchmark.py",
        "tools/visualization.py",
        "tools/demo_net.py",
        "tools/dataset_utils.py",
        "tools/ava_demo_precomputed_boxes.py",
    ],
)
