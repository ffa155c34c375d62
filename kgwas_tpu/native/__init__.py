"""Native (C++) host-side runtime for the shard compiler.

The reference's native layer is PyG's C++/CUDA scatter-sampler stack
(reference environment.yml:8-11); the TPU build's device compute is Pallas/XLA,
and the *host* hot loops (edge sort, CSR build, coalesce over tens of millions
of edges) live here as a CPython extension (`_shardops`), built via setup.py /
`make native`. Falls back to numpy when the extension isn't built.
"""
from . import shardops  # noqa: F401
