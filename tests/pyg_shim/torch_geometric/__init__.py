"""Minimal, faithful torch_geometric shim (PyG ~2.x semantics) used ONLY by
the parity-oracle tests to execute the reference's own source files
(/root/reference/kgwas/conv.py, model.py) as sealed oracles.

The environment has no network egress, so the real torch_geometric cannot be
installed; this shim re-implements exactly the public PyG surface those two
files import — MessagePassing (gather-j/gather-i collection, scatter
aggregation), utils.softmax, dense.Linear (incl. lazy -1 channels + glorot),
inits, HeteroConv and SAGEConv. The reference's *attention math* is never
restated here: conv.py runs verbatim on top of these primitives, which is
the point of the oracle (VERDICT round 1, item 2: everything previously
checked only against the builder's own numpy restatement).
"""
