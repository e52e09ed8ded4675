"""tpu-mednet: a TPU-native (JAX/XLA/Pallas) framework for 3D medical-image
patch-based training and sliding-window inference.

Built from scratch with the capabilities of the PyTorch reference
``tobiashepp/torch-mednet`` (package ``midasmednet``), re-designed TPU-first:

- NDHWC (channels-last) bf16 volumes, XLA Conv3D on the MXU
- pure-functional models (flax.linen) and losses
- jit/pjit training steps over a ``jax.sharding.Mesh`` (data parallelism,
  optional spatial partitioning with halo exchange)
- on-device augmentation and Gaussian-heatmap synthesis
- orbax checkpointing, TensorBoard/JSONL observability
- overlap-tiled sliding-window inference with exact stitch reassembly
"""

__version__ = "0.1.0"
