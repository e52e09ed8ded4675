from tpu_mednet.data.grid import (
    GridPatchSampler,
    grid_patch_generator,
    num_grid_patches,
)
from tpu_mednet.data.patch_sampler import MedDataset, PatchSampler
from tpu_mednet.data.readers import (
    DataReader,
    DataReaderHDF5,
    DataReaderNifti,
    DataReaderZarr,
    HDF5Reader,
    MemoryReader,
    NiftiReader,
    ZarrReader,
    open_reader,
)
from tpu_mednet.data.sampling import (
    compute_class_any_masks,
    get_labeled_position,
    get_random_patch_indices,
    one_hot_to_label,
)
from tpu_mednet.data.stores import VolumeDataset, VolumeGroup

__all__ = [
    "DataReader",
    "HDF5Reader",
    "ZarrReader",
    "NiftiReader",
    "MemoryReader",
    "DataReaderHDF5",
    "DataReaderZarr",
    "DataReaderNifti",
    "open_reader",
    "PatchSampler",
    "MedDataset",
    "GridPatchSampler",
    "grid_patch_generator",
    "num_grid_patches",
    "get_labeled_position",
    "get_random_patch_indices",
    "one_hot_to_label",
    "compute_class_any_masks",
    "VolumeGroup",
    "VolumeDataset",
]
