from vtm.checkpoints.convert import (  # noqa: F401
    convert_motionformer,
    convert_timesformer,
    convert_videomae,
    convert_vivit,
    load_torch_state_dict,
    strip_prefixes,
)
