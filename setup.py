"""Packaging for the gantts_tpu framework (reference setup.py parity:
the installable package is the model/loss/feature library plus, here, the
full TPU training/inference stack and the C++ host library sources)."""

from setuptools import find_packages, setup

setup(
    name="gantts_tpu",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas) GAN-based speech synthesis and "
        "voice conversion framework"),
    packages=find_packages(include=["gantts_tpu", "gantts_tpu.*"]),
    package_data={"gantts_tpu": ["../cpp/*.cpp", "../cpp/CMakeLists.txt"]},
    install_requires=[
        "numpy",
        "scipy",
        "jax",
        "flax",
        "optax",
        "scikit-learn",
    ],
    extras_require={
        "train": ["tqdm", "tensorboard"],
        "test": ["pytest"],
    },
    python_requires=">=3.10",
)
