from setuptools import find_packages, setup

setup(
    name="generative_detection_tpu",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas) pose-aware KL autoencoder for 3D object "
        "detection (OD-VAE)"
    ),
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "pyyaml",
        "pillow",
    ],
)
