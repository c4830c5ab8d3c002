"""Data layer: synthetic contract, loader batching/padding, real readers on a fake corpus."""

import os

import numpy as np
import pytest

from sml_tpu.config import Config
from sml_tpu.data.loader import Loader, build_datasets, concat_datasets
from sml_tpu.data.synthetic import SyntheticDataset


def cfg(**kw):
    base = dict(dataset="synthetic", synthetic_size=32, fixdim=64, batch_size=8)
    base.update(kw)
    return Config(**base)


def test_synthetic_contract():
    config = cfg()
    ds = SyntheticDataset("Train", config)
    s = ds[0]
    assert s["x_path"].shape == (64, 1024)
    assert s["x_omic"].shape == (431,)
    assert s["x_omic_tumor"].shape == (59,)
    assert s["x_omic_immune"].shape == (361,)
    assert s["labels"].shape == (12,)
    # deterministic
    s2 = SyntheticDataset("Train", config)[0]
    np.testing.assert_array_equal(s["x_path"], s2["x_path"])
    # label invariants
    lab = s["labels"]
    assert lab[5] in (0, 1, 2, 3)
    assert lab[9] in (0, 1)
    assert lab[10] == 1 - lab[9]
    assert lab[11] > 0


def test_synthetic_phases_differ():
    config = cfg()
    tr = SyntheticDataset("Train", config)
    te = SyntheticDataset("Test", config)
    assert len(te) == max(config.synthetic_size // 4, 8)
    assert not np.allclose(tr[0]["x_omic"], te[0]["x_omic"])


def test_loader_shuffle_and_padding():
    config = cfg(synthetic_size=20, batch_size=8)
    ds = SyntheticDataset("Train", config)

    train_loader = Loader(ds, 8, shuffle=True, drop_last=True, seed=1)
    assert len(train_loader) == 2
    b0 = [b for b in train_loader]
    train_loader.set_epoch(1)
    b1 = [b for b in train_loader]
    assert not np.allclose(b0[0]["x_omic"], b1[0]["x_omic"])  # reshuffled

    eval_loader = Loader(ds, 8)
    batches = list(eval_loader)
    assert len(batches) == 3
    assert batches[-1]["sample_mask"].sum() == 4  # 20 = 8+8+4
    assert batches[-1]["x_path"].shape[0] == 8    # padded


def test_loader_threaded_matches_sync():
    config = cfg(synthetic_size=16, batch_size=4)
    ds = SyntheticDataset("Test", config)
    sync = list(Loader(ds, 4, workers=0))
    thr = list(Loader(ds, 4, workers=2))
    assert len(sync) == len(thr)
    for a, b in zip(sync, thr):
        np.testing.assert_array_equal(a["x_omic"], b["x_omic"])


def test_concat_dataset_indexing():
    config = cfg(synthetic_size=8)
    a = SyntheticDataset("Train", config)
    b = SyntheticDataset("Test", config)
    c = concat_datasets([a, b])
    assert len(c) == len(a) + len(b)
    np.testing.assert_array_equal(c[0]["x_omic"], a[0]["x_omic"])
    np.testing.assert_array_equal(c[len(a)]["x_omic"], b[0]["x_omic"])


# ---------------------------------------------------------------------------
# real readers against a generated fake corpus
# ---------------------------------------------------------------------------

def _write_fake_corpus(root, fixdim=16, n_patients=6):
    """Build minimal IvYGAP+TCGA trees matching the reference layout."""
    import h5py
    import pandas as pd

    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "TCGA"), exist_ok=True)
    os.makedirs(os.path.join(root, "IvYGAP"), exist_ok=True)

    # gene signature (CSV fallback; 5 tumor + 7 immune = 12 genes)
    genes = [f"G{i}" for i in range(12)]
    sig = pd.DataFrame({"gene_symbol": genes,
                        "Type": ["Tumor"] * 5 + ["Immune"] * 7})
    sig.to_csv(os.path.join(root, "TCGA", "gene_signature_selected.csv"), index=False)

    # ---- TCGA ----
    rows = []
    tdir = os.path.join(root, "TCGA")
    os.makedirs(os.path.join(tdir, f"Res50_feature_{fixdim}_fixdim0_norm"),
                exist_ok=True)
    gdir = os.path.join(tdir, "transcriptomeProfiling_geneExpression")
    for i in range(n_patients):
        pid, sid = f"P{i}", f"S{i}"
        grade = ["G2", "G3", "G4"][i % 3]
        idh = "WT" if i % 2 == 0 else "Mutant"
        codel = "codel" if i % 3 == 0 else "non-codel"
        his = ["astrocytoma", "glioblastoma", "oligodendroglioma"][i % 3]
        dead, time = i % 2, 100.0 + 300 * i
        case_dir = os.path.join(gdir, f"case{i}")
        os.makedirs(case_dir, exist_ok=True)
        fname = f"expr{i}.tsv"
        with open(os.path.join(case_dir, fname), "w") as f:
            f.write("# comment line\n")
            f.write("gene_id\tgene_name\tfpkm_uq_unstranded\n")
            for g in genes:
                f.write(f"ENS_{g}\t{g}\t{rng.uniform(0, 100):.3f}\n")
        with h5py.File(os.path.join(
                tdir, f"Res50_feature_{fixdim}_fixdim0_norm", f"{sid}.h5"), "w") as h:
            h.create_dataset("Res_feature",
                             data=rng.normal(size=(1, fixdim, 1024)).astype(np.float32))
        rows.append([pid, sid, his, grade, idh, codel, 0, 0, 0, 0, 0,
                     f"case{i}", fname, dead, time])
    cols = ["patient", "slide", "his", "grade", "idh", "codel", "cdkn",
            "c7", "c8", "c9", "c10", "gene_dir", "gene_file", "dead", "time"]
    pd.DataFrame(rows, columns=cols).to_csv(
        os.path.join(tdir, "multimodal_diag_survival_TCGA.csv"), index=False)

    # ---- IvYGAP ----
    idir = os.path.join(root, "IvYGAP")
    os.makedirs(os.path.join(idir, f"Res50_feature_{fixdim}_fixdim0_norm"),
                exist_ok=True)
    gedir = os.path.join(idir, "gene_expression_matrix_2014-11-25")
    os.makedirs(gedir, exist_ok=True)
    pd.DataFrame({"gene_id": [f"ID{i}" for i in range(12)],
                  "gene_symbol": genes}).to_csv(
        os.path.join(gedir, "rows-genes.csv"), index=False)
    wells, specs = [], []
    rows_i = []
    for i in range(n_patients):
        pid = f"W{i}"
        sid = f"W{i}-1-1-D.01"
        wells.append(1000 + i)
        specs.append(f"W{i}-1-1")
        with h5py.File(os.path.join(
                idir, f"Res50_feature_{fixdim}_fixdim0_norm", f"{sid}.h5"), "w") as h:
            h.create_dataset("Res_feature",
                             data=rng.normal(size=(1, fixdim, 1024)).astype(np.float32))
        rows_i.append([pid, sid, 0, ["G2", "G3", "G4"][i % 3],
                       "WT" if i % 2 else "Mutant",
                       "codel" if i % 3 == 0 else "non-codel", 0,
                       i % 2, 150.0 + 200 * i])
    pd.DataFrame({"rna_well_id": wells,
                  "specimen_name": [s + "-X" for s in specs]}).to_csv(
        os.path.join(gedir, "columns-samples.csv"), index=False)
    fpkm = {"gene_id\\rna_well_id": [f"ID{i}" for i in range(12)]}
    for w in wells:
        fpkm[str(w)] = rng.uniform(0, 100, size=12)
    pd.DataFrame(fpkm).to_csv(os.path.join(gedir, "fpkm_table.csv"), index=False)
    cols_i = ["patient", "slide", "c2", "grade", "idh", "codel", "cdkn",
              "dead", "time"]
    pd.DataFrame(rows_i, columns=cols_i).to_csv(
        os.path.join(idir, "multimodal_diag_survival_IvY.csv"), index=False)


def test_real_readers_on_fake_corpus(tmp_path):
    _write_fake_corpus(str(tmp_path))
    config = Config(dataset="both", dataDir=str(tmp_path) + "/", fixdim=16,
                    input_size_omic=12, input_size_omic_tumor=5,
                    input_size_omic_immune=7, seed=3)

    for phase in ("Train", "Test"):
        ds = build_datasets(config, phase)
        assert len(ds) > 0
        s = ds[0]
        assert s["x_path"].shape == (16, 1024)
        assert s["x_omic"].shape == (12,)
        assert s["x_omic_tumor"].shape == (5,)
        assert s["x_omic_immune"].shape == (7,)
        assert s["labels"].shape == (12,)

    # patient-level split: no overlap between phases
    from sml_tpu.data.datasets import TCGADataset
    tr = set(TCGADataset("Train", config).rows[:, 0])
    te = set(TCGADataset("Test", config).rows[:, 0])
    va = set(TCGADataset("Val", config).rows[:, 0])
    assert not (tr & te) and not (tr & va) and not (te & va)
