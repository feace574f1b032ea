"""insarseg — a TPU-native (JAX/XLA/Pallas/pjit) framework for InSAR sea-ice
deformation segmentation.

Re-implements, TPU-first, the full capability set of the reference repo
Createroner/InSAR-Unet-CA (9 PyTorch training scripts: {U-Net, DeepLabV3,
"PSPNet"(=FCN-ResNet50)} x {plain, channel-attention, spatial-attention}),
de-duplicated into a real library:

- ``insarseg.ops``      — primitive layers (torch-semantics Conv/BN/ConvT),
                          attention blocks, resize ops, Pallas kernels.
- ``insarseg.models``   — UNet / DeepLabV3 / FCN ("PSPNet") / true PSPNet
                          model families + registry of the 9 reference presets.
- ``insarseg.data``     — VOC-layout dataset reader, transform pipeline,
                          sliding-window split/stitch for full scenes.
- ``insarseg.train``    — jitted train/eval engine, losses, on-device metrics,
                          Orbax checkpointing, JSON history contract.
- ``insarseg.parallel`` — device mesh + sharding helpers (data / spatial
                          parallelism over a TPU slice via GSPMD).
- ``insarseg.compat``   — PyTorch ``state_dict`` <-> JAX param converters for
                          parity testing against the reference.
- ``insarseg.engines``  — serving-engine factory: the parity module graph,
                          BN-folded exact serve graphs, and int8 PTQ engines
                          for every model family (one ``make_engine`` call).

Everything in the compute path is NHWC, jit-compilable, static-shape, and
designed to map onto the TPU MXU/VPU; multi-chip execution goes through
``jax.sharding`` over an ICI mesh, never host loops.
"""

__version__ = "0.1.0"

from insarseg import config as config  # noqa: F401
