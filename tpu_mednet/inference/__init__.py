from tpu_mednet.inference.sliding_window import pad_batch, predict_volumes

__all__ = ["predict_volumes", "pad_batch"]
