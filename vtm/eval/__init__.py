from vtm.eval.metrics import (  # noqa: F401
    topks_correct,
    topk_accuracies,
    topk_errors,
    multitask_topk_accuracies,
    multitask_topks_correct,
)
from vtm.eval.meters import TestMeter, EPICTestMeter, TrainMeter, ValMeter  # noqa: F401
