"""kgwas_tpu: TPU-native framework with the capabilities of snap-stanford/KGWAS.

Builds the optional native shard-compiler extension (C++); falls back to the
numpy implementation if the toolchain is unavailable.
"""
import os

import numpy as np
from setuptools import Extension, find_packages, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Never fail the install over the native extension."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # pragma: no cover
            print(f"WARNING: native extension build failed ({e}); "
                  "using numpy fallback")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover
            print(f"WARNING: building {ext.name} failed ({e}); "
                  "using numpy fallback")


ext_modules = [
    Extension(
        "kgwas_tpu.native._shardops",
        sources=["kgwas_tpu/native/_shardops.cpp"],
        include_dirs=[np.get_include()],
        extra_compile_args=["-O3", "-std=c++17"],
        language="c++",
    )
]

setup(
    name="kgwas_tpu",
    version="0.1.0",
    description=(
        "TPU-native geometric deep learning framework for boosting the "
        "statistical power of small-cohort GWAS (KGWAS method)"
    ),
    packages=find_packages(exclude=["tests"]),
    ext_modules=ext_modules,
    cmdclass={"build_ext": OptionalBuildExt},
    python_requires=">=3.10",
    install_requires=[
        "numpy",
        "pandas",
        "scipy",
        "scikit-learn",
        "jax",
        "optax",
    ],
)
