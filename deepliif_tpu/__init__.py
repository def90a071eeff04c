"""DeepLIIF-TPU: a TPU-native (JAX / XLA / Pallas / pjit) framework for
multitask conditional-GAN computational pathology.

Re-designed from scratch for TPU hardware with the capabilities of the
reference DeepLIIF framework (nadeemlab/DeepLIIF): IHC -> multiplex-mpIF
translation + cell segmentation/classification + quantification, scaling
from single 512x512 tiles to whole-slide images.

Key design differences vs the reference (see SURVEY.md section 7):
  * The 9-net ensemble (4 translators + 5 seg generators) is ONE jitted
    XLA program batched over tiles, not a Dask graph over devices.
  * Models are pure functions over parameter pytrees; training steps are
    jit-compiled G/D alternating updates.
  * Multi-device scaling uses jax.sharding.Mesh + ICI collectives instead
    of DataParallel / DDP+NCCL.
  * Host-side sequential post-processing kernels (connected components,
    boundary tracing) are native C++; parallelizable pixel ops run on
    device via XLA/Pallas.
"""

__version__ = "0.1.0"
