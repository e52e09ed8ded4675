from tpu_mednet.inference.common import (
    RoundRobinPlacement,
    round_robin_placement,
)
from tpu_mednet.inference.device_sliding import predict_volumes_on_device
from tpu_mednet.inference.serving import (
    detect_task_name,
    export_predictor,
    load_exported,
    make_serving_fn,
    save_exported,
)
from tpu_mednet.inference.sliding_window import pad_batch, predict_volumes
from tpu_mednet.inference.weighted import (
    gaussian_window,
    predict_volumes_weighted,
    predict_volumes_weighted_on_device,
)

__all__ = [
    "predict_volumes",
    "predict_volumes_on_device",
    "predict_volumes_weighted",
    "predict_volumes_weighted_on_device",
    "gaussian_window",
    "pad_batch",
    "export_predictor",
    "save_exported",
    "load_exported",
    "make_serving_fn",
    "detect_task_name",
    "RoundRobinPlacement",
    "round_robin_placement",
]
