"""mtp_tpu — TPU-native multi-task remote-sensing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ViTAE-Transformer/MTP (multi-task pretraining of remote-sensing foundation
models + five downstream task suites), built TPU-first:

- backbones (ViT+RVSA, InternImage/DCNv3) as jit-compiled NHWC models with
  Pallas kernels on the hot paths,
- fixed-shape detection plumbing (padded top-k proposals, mask-based NMS),
- data-parallel / model-parallel training over a `jax.sharding.Mesh`,
- sliding-window inference compiled as a single scan,
- orbax checkpoints + a PyTorch weight converter for the released MTP weights.

See SURVEY.md for the structural map of the reference this rebuilds.
"""

__version__ = "0.1.0"
