"""ctagan_tpu — a TPU-native (JAX/XLA/Pallas) CT -> CTA synthesis framework.

A ground-up rebuild of the capabilities of the yml-bit/CTA-GAN reference
(PyTorch research code) as an idiomatic JAX framework:

- ``ctagan_tpu.ops``      — pure-functional compute ops (HU windowing, dense
  warp, losses, metrics, on-device augmentation), NHWC layout, Pallas kernels
  for the hot paths.
- ``ctagan_tpu.models``   — the network zoo (ResNet generator, PatchGAN /
  multi-scale discriminators, ResUNet registration net) as Flax modules.
- ``ctagan_tpu.data``     — host-side DICOM data plane: corpus builder,
  paired datasets, double-buffered device feed, synthetic-DICOM fixtures.
- ``ctagan_tpu.train``    — the four trainer families (pix2pix, CycleGAN,
  RegGAN, CTA-GAN HD stage 1/2) as jitted functional train steps.
- ``ctagan_tpu.parallel`` — device-mesh data parallelism and sharded
  sliding-window volume inference.
- ``ctagan_tpu.utils``    — config, logging, checkpointing, seeding.
"""

__version__ = "0.1.0"
