"""torch_geometric.transforms — ToUndirected / AddSelfLoops only.

Faithful re-implementation of the documented PyG ~2.x semantics, so the
reference's `kgwas_data.load_kg` (which ends with
``T.ToUndirected()(data); T.AddSelfLoops()(data)``, reference
kgwas_data.py:271-272) can execute VERBATIM as a parity oracle:

  * ToUndirected: bipartite edge type -> NEW ``(dst, 'rev_'+rel, src)``
    storage with flipped indices; homogeneous edge type -> symmetrize in
    place (concat flipped, coalesce = sort by (src, dst), dedupe).
  * AddSelfLoops: homogeneous edge types only; append (i, i) for every
    node of the type, no dedupe against existing loops.
"""
import torch


def _coalesce(ei):
    if ei.numel() == 0:
        return ei
    n = int(ei.max().item()) + 1
    key = ei[0].long() * n + ei[1].long()
    order = torch.argsort(key, stable=True)
    key_s = key[order]
    keep = torch.ones(key_s.numel(), dtype=torch.bool)
    keep[1:] = key_s[1:] != key_s[:-1]
    return ei[:, order[keep]]


class ToUndirected:
    def __call__(self, data):
        for et in list(data.edge_types):
            src_t, rel, dst_t = et
            ei = data[et].edge_index
            if src_t == dst_t:
                data[et].edge_index = _coalesce(
                    torch.cat([ei, ei.flip(0)], dim=1))
            else:
                data[(dst_t, "rev_" + rel, src_t)].edge_index = ei.flip(0)
        return data


class AddSelfLoops:
    def __call__(self, data):
        for et in list(data.edge_types):
            src_t, _, dst_t = et
            if src_t != dst_t:
                continue
            n = data[src_t].x.shape[0]
            loops = torch.arange(n, dtype=torch.long)
            data[et].edge_index = torch.cat(
                [data[et].edge_index, torch.stack([loops, loops])], dim=1)
        return data
