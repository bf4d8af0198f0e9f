from setuptools import find_packages, setup

setup(
    name="rodynrf_tpu",
    version="0.1.0",
    description="TPU-native JAX framework for Robust Dynamic Radiance Fields",
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
)
