"""Real-data path hardening (VERDICT round-1 item 8): the download/extract
machinery and the full kgwas_101 fast-mode workflow run against a fabricated
mini KG bundle that matches the real tarball layout exactly
(REQUIRED_FILES in kgwas_data.py; reference kgwas_data.py:94-148,261-310) —
so the moment the real ~55GB bundle is present, the same code paths execute
unchanged."""
import os
import pickle
import tarfile

import numpy as np
import pandas as pd
import pytest

from kgwas_tpu import KGWAS, KGWAS_Data
from kgwas_tpu.kgwas_data import REQUIRED_FILES

N_SNP, N_GENE, N_GO = 60, 20, 8


def _build_bundle_tree(root):
    """Write a layout-exact mini bundle under root/ ."""
    rng = np.random.default_rng(0)
    snp_ids = [f"rs{1000 + i}" for i in range(N_SNP)]
    gene_ids = [f"ENSG{i:011d}" for i in range(N_GENE)]
    go_ids = [f"GO:{i:07d}" for i in range(N_GO)]
    go_types = ["CellularComponent", "BiologicalProcess", "MolecularFunction"]

    idx2id = {
        "SNP": dict(enumerate(snp_ids)),
        "Gene": dict(enumerate(gene_ids)),
        **{t: dict(enumerate(go_ids)) for t in go_types},
    }
    id2idx = {t: {v: k for k, v in m.items()} for t, m in idx2id.items()}

    def rand_edges(ns, nd, e):
        return np.stack([rng.integers(0, ns, e), rng.integers(0, nd, e)])

    edge_index = {
        ("SNP", "TSS", "Gene"): rand_edges(N_SNP, N_GENE, N_SNP),
        ("SNP", "Enhancer-eQTL-Gene", "Gene"): rand_edges(N_SNP, N_GENE, 2 * N_SNP),
        ("Gene", "Gene-PPI-Gene", "Gene"): rand_edges(N_GENE, N_GENE, 3 * N_GENE),
        **{
            ("Gene", f"Gene-memberof-{t}", t): rand_edges(N_GENE, N_GO, 2 * N_GENE)
            for t in go_types
        },
        ("BiologicalProcess", "BP-parentof-BP", "BiologicalProcess"):
            rand_edges(N_GO, N_GO, N_GO),
    }

    def dump(rel, obj):
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            pickle.dump(obj, f)

    dump("cell_kg/network/node_idx2id.pkl", idx2id)
    dump("cell_kg/network/node_id2idx.pkl", id2idx)
    dump("cell_kg/network/edge_index.pkl",
         {k: v.tolist() for k, v in edge_index.items()})
    # feature tables keyed by node id; a few ids intentionally MISSING to
    # exercise the random-fallback branch (reference kgwas_data.py:179-181)
    dump("cell_kg/node_emb/variant_emb/enformer_feat.pkl",
         {s: rng.standard_normal(20).astype(np.float32)
          for s in snp_ids[: N_SNP - 5]})
    dump("cell_kg/node_emb/gene_emb/esm_feat.pkl",
         {gid: rng.standard_normal(5120).astype(np.float32)
          for gid in gene_ids[: N_GENE - 2]})

    ld = pd.DataFrame({"ID": snp_ids,
                       "ldscore": rng.uniform(1, 50, N_SNP)})
    wld = pd.DataFrame({"ID": snp_ids,
                        "ldscore": rng.uniform(0, 20, N_SNP)})
    os.makedirs(os.path.join(root, "ld_score"), exist_ok=True)
    ld.to_csv(os.path.join(root, "ld_score/filter_genotyped_ldscores.csv"),
              index=False)
    wld.to_csv(os.path.join(root, "ld_score/ldscores_from_data.csv"),
               index=False)
    dump("ld_score/ukb_white_ld_10MB_no_hla.pkl", {s: [] for s in snp_ids})
    dump("ld_score/ukb_white_ld_10MB.pkl", {s: [] for s in snp_ids})

    os.makedirs(os.path.join(root, "misc_data"), exist_ok=True)
    bim = pd.DataFrame({
        "chr": rng.integers(1, 23, N_SNP), "id": snp_ids,
        "cm": np.linspace(0, 1, N_SNP),
        "pos": np.sort(rng.integers(1, 10**8, N_SNP)),
        "a1": "A", "a2": "G",
    })
    bim.to_csv(os.path.join(root, "misc_data/ukb_white_with_cm.bim"),
               sep="\t", header=False, index=False)
    return snp_ids


def _write_sumstats(path, snp_ids, seed=1):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "CHR": rng.integers(1, 23, len(snp_ids)),
        "SNP": snp_ids,
        "POS": np.sort(rng.integers(1, 10**8, len(snp_ids))),
        "A1": "A", "A2": "G", "N": 10000,
        "AF1": rng.uniform(0.05, 0.95, len(snp_ids)),
        "BETA": rng.standard_normal(len(snp_ids)) * 0.02,
        "SE": rng.uniform(0.01, 0.03, len(snp_ids)),
        "P": rng.uniform(0, 1, len(snp_ids)),
    })
    df.to_csv(path, sep="\t", index=False)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    src = tmp_path_factory.mktemp("bundle_src")
    snp_ids = _build_bundle_tree(str(src))
    tar_path = tmp_path_factory.mktemp("tar") / "kgwas_core_data.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tar:
        for name in os.listdir(src):
            tar.add(os.path.join(src, name), arcname=name)
    return {"tar": str(tar_path), "snp_ids": snp_ids, "src": str(src)}


def test_download_and_extract_matches_bundle_layout(bundle, tmp_path,
                                                    monkeypatch):
    """KGWAS_Data.__init__ auto-download: fetch the tarball (file:// through
    the same urllib path as https), extract, and satisfy REQUIRED_FILES."""
    import kgwas_tpu.kgwas_data as kd

    monkeypatch.setattr(kd, "CORE_DATA_URL", "file://" + bundle["tar"])
    data_dir = tmp_path / "data"
    KGWAS_Data(data_path=str(data_dir))
    for rel in REQUIRED_FILES:
        assert (data_dir / rel).exists(), f"missing {rel} after extract"
    assert not (data_dir / "kgwas_core_data.tar.gz").exists()  # cleaned up


def test_kgwas_101_fast_mode_on_bundle(bundle, tmp_path):
    """The kgwas_101 demo flow (reference demo notebook + kgwas_data.py
    fast-mode config): load_kg from the bundle, external sumstats,
    process_gwas_file with the bundle's LD scores, split, train, KGWAS_P."""
    data = KGWAS_Data(data_path=bundle["src"], offline=True)
    data.load_kg(snp_init_emb="enformer", go_init_emb="random",
                 gene_init_emb="esm")
    assert data.graph.num_nodes("SNP") == N_SNP
    assert data.snp_init_dim_size == 20
    assert data.gene_init_dim_size == 5120

    ss_path = tmp_path / "sumstats.fastGWA"
    _write_sumstats(str(ss_path), bundle["snp_ids"])
    data.load_external_gwas(path=str(ss_path))
    data.process_gwas_file()
    data.prepare_split()

    run = KGWAS(data, exp_name="bundle101", seed=1)
    run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=16)
    res = run.train(batch_size=16, epoch=1, save_best_model=False)
    assert len(res) == N_SNP
    assert res.KGWAS_P.between(0, 1).all()


def test_example_gwas_download_path(bundle, tmp_path, monkeypatch):
    """load_external_gwas(example_file=True) downloads the example sumstats
    through the same code path as the real Dataverse URL."""
    import kgwas_tpu.kgwas_data as kd

    ss_path = tmp_path / "example.fastGWA"
    _write_sumstats(str(ss_path), bundle["snp_ids"])
    monkeypatch.setattr(kd, "EXAMPLE_GWAS_URL", "file://" + str(ss_path))

    data = KGWAS_Data(data_path=bundle["src"], offline=True)
    data.load_kg(snp_init_emb="random", go_init_emb="random",
                 gene_init_emb="random")
    data.load_external_gwas(example_file=True)
    assert data.pheno == "EXTERNAL"
    assert len(data.lr_uni) == N_SNP
    # file cached for reruns (reference kgwas_data.py:300-305)
    cached = os.path.join(
        bundle["src"], "biochemistry_Creatinine_fastgwa_full_10000_1.fastGWA")
    assert os.path.exists(cached)
    os.remove(cached)


def test_reference_loader_cross_check_on_bundle(bundle):
    """VERDICT r4 item 6: run the REFERENCE's own KGWAS_Data.load_kg
    (reference kgwas_data.py:112-273, verbatim under the pyg_shim) on the
    SAME fabricated layout-exact bundle and assert this framework's loader
    materializes identical feature matrices and edge inventories — so any
    misreading of the pkl/CSV quirks (enformer/esm keyed-dict lookups,
    rand-fallback rows for missing ids, ToUndirected/AddSelfLoops relation
    inventory) fails loudly. Rand-fallback rows (5 SNPs, 2 genes) are
    compared structurally; GO 'random' embeddings by shape/range."""
    import importlib
    import sys
    import types

    SHIM = os.path.join(os.path.dirname(__file__), "pyg_shim")
    REF = os.environ.get("KGWAS_REFERENCE_DIR", "/root/reference/kgwas")
    if not os.path.isfile(os.path.join(REF, "kgwas_data.py")):
        pytest.skip(f"reference sources not available at {REF}")

    sys.path.insert(0, SHIM)
    try:
        for m in list(sys.modules):
            if m.split(".")[0] in ("torch_geometric", "torch_sparse",
                                   "refkgwas"):
                del sys.modules[m]
        pkg = types.ModuleType("refkgwas")
        pkg.__path__ = [REF]
        sys.modules["refkgwas"] = pkg
        ref_mod = importlib.import_module("refkgwas.kgwas_data")

        ref = ref_mod.KGWAS_Data(data_path=bundle["src"])
        ref.load_kg(snp_init_emb="enformer", go_init_emb="random",
                    gene_init_emb="esm")
        refd = ref.data
    finally:
        sys.path.remove(SHIM)

    ours = KGWAS_Data(data_path=bundle["src"], offline=True)
    ours.load_kg(snp_init_emb="enformer", go_init_emb="random",
                 gene_init_emb="esm")
    g = ours.graph

    # --- node id maps ----------------------------------------------------
    assert ours.idx2id == ref.idx2id and ours.id2idx == ref.id2idx

    # --- feature matrices ------------------------------------------------
    with open(os.path.join(
            bundle["src"],
            "cell_kg/node_emb/variant_emb/enformer_feat.pkl"), "rb") as f:
        enf = pickle.load(f)
    with open(os.path.join(
            bundle["src"],
            "cell_kg/node_emb/gene_emb/esm_feat.pkl"), "rb") as f:
        esm = pickle.load(f)
    for ntype, table in (("SNP", enf), ("Gene", esm)):
        ref_x = refd[ntype].x.numpy()
        our_x = g.node_features[ntype]
        assert ref_x.shape == our_x.shape
        assert ref_x.dtype == our_x.dtype == np.float32
        present = [i for i, nid in ref.idx2id[ntype].items() if nid in table]
        missing = [i for i, nid in ref.idx2id[ntype].items()
                   if nid not in table]
        assert missing, f"{ntype}: bundle must exercise the rand fallback"
        # present rows: BIT-FOR-BIT across reference loader, our loader,
        # and the pkl source of truth
        np.testing.assert_array_equal(ref_x[present], our_x[present])
        np.testing.assert_array_equal(
            our_x[present],
            np.stack([table[ref.idx2id[ntype][i]] for i in present]))
        # fallback rows: structural parity (torch.rand / default_rng draws
        # differ by construction): uniform [0,1), not copied from the table
        for x in (ref_x, our_x):
            assert (x[missing] >= 0).all() and (x[missing] < 1).all()
            assert np.abs(x[missing]).sum() > 0
    for t in ("CellularComponent", "BiologicalProcess", "MolecularFunction"):
        assert refd[t].x.shape == g.node_features[t].shape == (N_GO, 128)

    # --- edge inventory after ToUndirected + AddSelfLoops ----------------
    ref_edges = {et: refd[et].edge_index.numpy() for et in refd.edge_types}
    assert set(ref_edges) == set(g.edge_index), (
        sorted(set(ref_edges) ^ set(g.edge_index)))
    for et in ref_edges:
        np.testing.assert_array_equal(
            ref_edges[et], g.edge_index[et],
            err_msg=f"edge mismatch for {et}")
