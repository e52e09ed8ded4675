from tpu_mednet.train.checkpoint import CheckpointManager, load_for_inference
from tpu_mednet.train.loop import NonFiniteError, Trainer
from tpu_mednet.train.optim import OptimizerConfig
from tpu_mednet.train.state import TrainState, create_train_state, param_count
from tpu_mednet.train.step import make_eval_step, make_predict_step, make_train_step

__all__ = [
    "Trainer",
    "NonFiniteError",
    "TrainState",
    "create_train_state",
    "param_count",
    "make_train_step",
    "make_eval_step",
    "make_predict_step",
    "CheckpointManager",
    "load_for_inference",
    "OptimizerConfig",
]
