from vtm.data.loader import (  # noqa: F401
    DATASET_REGISTRY,
    BatchLoader,
    build_dataset,
    construct_loader,
    register_dataset,
    shuffle_dataset,
)
from vtm.data import kinetics, ssv2, epickitchens, charades, imagenet, ava, synthetic, ptv  # noqa: F401
