from vtm.models.build import MODEL_REGISTRY, build_model, register_model  # noqa: F401
from vtm.models import videomae, vivit, timesformer, motionformer, slowfast, mvit, masked, ptv  # noqa: F401
