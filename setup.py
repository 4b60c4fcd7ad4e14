"""Packaging (reference: setup.py ships 'MixGate' 2.0.1; this framework is
the TPU-native rebuild)."""
from setuptools import find_packages, setup

setup(
    name="mgvae-tpu",
    version="0.1.0",
    description="TPU-native multi-gate circuit representation learning (Multi-Gate-VAE rebuild)",
    packages=find_packages(include=["mgvae_tpu", "mgvae_tpu.*", "deepgate"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy"],
    extras_require={
        "torch-compat": ["torch"],
        "test": ["pytest", "torch"],
    },
)
