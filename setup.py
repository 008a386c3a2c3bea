from setuptools import find_packages, setup

setup(
    name="adaptive-classifier-tpu",
    version="0.1.0",
    description="TPU-native adaptive text classification (JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests", "scripts", "examples", "native")),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "numpy",
        "flax",
        "safetensors",
    ],
    extras_require={
        "test": ["pytest"],
        "hub": ["huggingface_hub"],
    },
)
