"""kgwas_tpu: TPU-native framework with the capabilities of snap-stanford/KGWAS.

Public API mirrors the reference package (reference kgwas/__init__.py:1-3):
    from kgwas_tpu import KGWAS, KGWAS_Data, ukbb_cohort
"""
from .version import __version__

from .config import ModelConfig, TrainConfig, MeshConfig

__all__ = ["__version__", "ModelConfig", "TrainConfig", "MeshConfig"]

try:  # engine pulls in jax; keep graph/stats importable without it
    from .kgwas import KGWAS
    from .kgwas_data import KGWAS_Data
    from .cohort.ukbb import ukbb_cohort

    __all__ += ["KGWAS", "KGWAS_Data", "ukbb_cohort"]

    # Persistent XLA compilation cache, package-wide: TPU compiles of the
    # standard demo/bench shapes run minutes; every entry point (not just
    # KGWAS.__init__, which already did this) should hit the disk cache.
    # No-op if jax lacks the knobs or the dir is unwritable; disable with
    # KGWAS_TPU_CACHE_DIR="".
    from .utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
except ImportError:  # pragma: no cover
    pass
