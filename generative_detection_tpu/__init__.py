"""generative_detection_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of OD-VAE.

A brand-new framework with the capabilities of
``tanushreebanerjee/generative-detection`` ("OD-VAE: Inverting Generation for
3D Object Detection"): a pose-aware KL autoencoder trained on nuScenes object
patches, whose pose head doubles as a per-patch 3D detector.

Layer map (mirrors the reference's 5 layers, re-designed TPU-first):

- ``train.py`` (repo root)        — CLI / experiment driver   (ref: train.py)
- ``config``                      — YAML ``{target, params}`` instantiation
                                    (ref: ldm.util.instantiate_from_config)
- ``train``                       — functional train loop, two optax optimizers,
                                    checkpointing, logging (ref: PyTorch Lightning)
- ``models`` / ``losses`` / ``ops`` — model & loss, Pallas/XLA kernels
                                    (ref: src/models, src/modules, ldm/taming)
- ``data`` / ``geometry``         — nuScenes patch pipeline & camera math
                                    (ref: src/data, src/util/cameras.py)
- ``parallel``                    — mesh / sharding / collectives (ref: DDP+NCCL)
"""

__version__ = "0.1.0"
