from tpu_mednet.tasks.landmarks import LandmarkTask
from tpu_mednet.tasks.segmentation import SegmentationTask

__all__ = ["SegmentationTask", "LandmarkTask"]
