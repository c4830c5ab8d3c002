"""IvYGAP and TCGA multimodal dataset readers (reference ``data/dataset.py``).

Sample contract: (x_path (fixdim, 1024) f32, x_omic (431,), x_omic_tumor (59,),
x_omic_immune (361,), labels (12,)).  Splits are patient-level after a seeded shuffle
(0.8/0.1/0.1 — val is the LAST 10%, test the middle, reference ``dataset.py:63-78``; or
0.67/0.33 with ``novalset``).  WSI features come from per-slide HDF5 files
(``Res50_feature_{fixdim}_fixdim0_norm/{id}.h5`` key ``Res_feature``); survival bins use
the fixed TCGA+IvYGAP quantiles.

The gene-signature table is ``TCGA/gene_signature_selected.xlsx`` (sheet
``0.3_high_exp``) in the reference; since xlsx needs openpyxl (absent here) a CSV with
the same columns (``gene_signature_selected.csv``) is accepted as a fallback.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from sml_tpu.config import Config
from sml_tpu.data.synthetic import QUANTILES_ALL, QUANTILES_UNCENSORED

# label-vector slot layout (reference data/dataset.py:523)
LABEL_SLOTS = ("IDH", "1p19q", "CDKN", "His", "Grade", "Diag2021", "His_2class",
               "Subtype", "survival_bin", "censor", "event", "survival_time")


def _read_gene_signature(data_dir: str):
    import pandas as pd

    xlsx = os.path.join(data_dir, "TCGA", "gene_signature_selected.xlsx")
    csv = os.path.join(data_dir, "TCGA", "gene_signature_selected.csv")
    if os.path.exists(csv):
        share = pd.read_csv(csv, header=0)
    else:
        share = pd.read_excel(xlsx, sheet_name="0.3_high_exp", header=0)
    tumor = share[share["Type"] == "Tumor"]
    immune = share[share["Type"] == "Immune"]
    return share, tumor, immune


def _patient_split(patients: np.ndarray, seed: int, novalset: bool
                   ) -> Dict[str, set]:
    rng = np.random.RandomState(seed)
    patients = np.unique(patients)
    rng.shuffle(patients)
    n = len(patients)
    if novalset:
        return {"Train": set(patients[: int(n * 0.67)]),
                "Val": set(),
                "Test": set(patients[int(n * 0.67):])}
    return {"Train": set(patients[: int(n * 0.8)]),
            "Test": set(patients[int(n * 0.8): int(n * 0.9)]),
            "Val": set(patients[int(n * 0.9):])}


def _quantiles(config: Config) -> Tuple[float, float, float]:
    return (QUANTILES_UNCENSORED if config.survival_interval == "uncensored"
            else QUANTILES_ALL)


def _survival_bin(t: float, q: Tuple[float, float, float]) -> int:
    return 0 if t < q[0] else 1 if t < q[1] else 2 if t < q[2] else 3


def _diag_labels(idh: str, codel: str, cdkn, grade: str) -> Tuple[int, int]:
    """(diag2021, subtype) — shared WHO-2021 rule (reference dataset.py:224-241)."""
    if idh == "WT":
        return 0, 0                                  # Grade-4 GBM
    if codel == "codel":
        return 3, 2                                  # Oligo
    if cdkn in (-2, -1) or grade == "G4":
        return 1, 1                                  # Grade-4 Astro
    return 2, 1                                      # Grade-2/3 Astro


def _grade_label(grade: str) -> int:
    return 0 if grade == "G2" else 1 if grade == "G3" else 2


class _H5FeatureReader:
    def __init__(self, root: str):
        self.root = root

    def __call__(self, slide_id: str) -> np.ndarray:
        import h5py

        with h5py.File(os.path.join(self.root, f"{slide_id}.h5"), "r") as f:
            return np.asarray(f["Res_feature"][:])[0]


class RawPatchReader:
    """End-to-end raw-JPEG bag reader (reference ``read_img``, dataset.py:142-186).

    Reads the per-slide patch JPEGs listed in ``read_details/{slide}.npy``, pads by
    repetition (or uniformly subsamples) to exactly ``fixdim`` patches and returns a
    (fixdim, 224*224*3) float32 array in [0, 1].  Used with ``if_end2end`` pipelines
    that train a feature extractor jointly; the default pipeline consumes
    pre-extracted ResNet-50 features instead.
    """

    def __init__(self, cohort_dir: str, wsi_root: str, fixdim: int,
                 patch_size: int = 224):
        self.cohort_dir = cohort_dir
        self.wsi_root = wsi_root
        self.fixdim = fixdim
        self.patch_size = patch_size

    def _load(self, wsi_path: str, coord) -> np.ndarray:
        from PIL import Image

        fname = f"{coord[0]}_{coord[1]}.jpg"
        with Image.open(os.path.join(wsi_path, fname)) as im:
            return np.asarray(im.convert("RGB"))

    def __call__(self, slide_id: str) -> np.ndarray:
        details = np.load(os.path.join(self.cohort_dir, "read_details",
                                       f"{slide_id}.npy"), allow_pickle=True)[0]
        num = details.shape[0]
        wsi_path = os.path.join(self.wsi_root, slide_id)
        max_num = self.fixdim

        if num <= max_num:
            patches = [self._load(wsi_path, details[i]) for i in range(num)]
            times, remaining = max_num // num, max_num % num
            bag = patches * times + patches[:remaining]
        else:
            idx = [int(np.around(i * (num / max_num))) for i in range(max_num)]
            bag = [self._load(wsi_path, details[min(i, num - 1)]) for i in idx]

        arr = np.asarray(bag, dtype=np.float32).reshape(max_num, -1) / 255.0
        return arr


class IvYGAPDataset:
    """Allen-Institute IvYGAP cohort: fpkm gene tables joined by specimen name."""

    def __init__(self, phase: str, config: Config, if_end2end: bool = False):
        import pandas as pd

        self.config = config
        self.phase = phase
        self.if_end2end = if_end2end
        d = config.dataDir
        table = pd.read_csv(os.path.join(d, "IvYGAP", "multimodal_diag_survival_IvY.csv"),
                            header=0).values
        split = _patient_split(table[:, 0], config.seed, config.novalset)[phase]
        self.rows = np.asarray([r for r in table if r[0] in split])

        gdir = os.path.join(d, "IvYGAP", "gene_expression_matrix_2014-11-25")
        rows_genes = pd.read_csv(os.path.join(gdir, "rows-genes.csv"), header=0)
        self.columns_samples = pd.read_csv(os.path.join(gdir, "columns-samples.csv"),
                                           header=0)
        fpkm = pd.read_csv(os.path.join(gdir, "fpkm_table.csv"), header=0)

        share, tumor, immune = _read_gene_signature(d)
        gene_col = "gene_id\\rna_well_id"
        sel = lambda sig: rows_genes[rows_genes["gene_symbol"].isin(
            sig["gene_symbol"].values.tolist())]["gene_id"].values.tolist()
        self.fpkm = fpkm[fpkm[gene_col].isin(sel(share))]
        self.fpkm_tumor = fpkm[fpkm[gene_col].isin(sel(tumor))]
        self.fpkm_immune = fpkm[fpkm[gene_col].isin(sel(immune))]

        self.columns_samples["specimen_name_temp"] = self.columns_samples[
            "specimen_name"].apply(lambda x: "-".join(x.split("-")[:3]))
        self.quantiles = _quantiles(config)
        if if_end2end:
            self.read_feature = RawPatchReader(
                os.path.join(d, "IvYGAP"), os.path.join(d, "IvYGAP", "wsi"),
                config.fixdim)
        else:
            self.read_feature = _H5FeatureReader(
                os.path.join(d, "IvYGAP", f"Res50_feature_{config.fixdim}_fixdim0_norm"))

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.rows[index]
        wsi = self.read_feature(row[1]).astype(np.float32)
        omic, tumor, immune = self._genes(row[1])
        return {"x_path": wsi, "x_omic": omic, "x_omic_tumor": tumor,
                "x_omic_immune": immune, "labels": self._labels(row)}

    def _genes(self, wsi_id: str):
        specimen = "-".join(wsi_id.split("-")[:3])
        match = self.columns_samples[
            self.columns_samples["specimen_name_temp"] == specimen]
        if len(match) == 0:
            raise KeyError(f"specimen {specimen} not in IvYGAP gene table")
        well = str(match["rna_well_id"].values[0])
        return (self.fpkm[well].values.astype(np.float32),
                self.fpkm_tumor[well].values.astype(np.float32),
                self.fpkm_immune[well].values.astype(np.float32))

    def _labels(self, row) -> np.ndarray:
        grade = _grade_label(row[3])
        diag, subtype = _diag_labels(row[4], row[5], row[6], row[3])
        t = float(row[-1])
        surv_bin = _survival_bin(t, self.quantiles)
        dead = row[-2] == 1
        censor, event = (0, 1) if dead else (1, 0)
        # IvYGAP zero-fills molecular slots 0-3 and 6 (reference dataset.py:269)
        return np.asarray([0, 0, 0, 0, grade, diag, 0, subtype, surv_bin, censor,
                           event, t], dtype=np.float32)


class TCGADataset:
    """TCGA cohort: per-sample GDC gene-expression TSVs, richer molecular labels."""

    def __init__(self, phase: str, config: Config, if_end2end: bool = False):
        import pandas as pd

        self.config = config
        self.phase = phase
        self.if_end2end = if_end2end
        d = config.dataDir
        table = pd.read_csv(os.path.join(d, "TCGA", "multimodal_diag_survival_TCGA.csv"),
                            header=0).values
        split = _patient_split(table[:, 0], config.seed, config.novalset)[phase]
        self.rows = np.asarray([r for r in table if r[0] in split])

        self.share, self.share_tumor, self.share_immune = _read_gene_signature(d)
        self.quantiles = _quantiles(config)
        if if_end2end:
            self.read_feature = RawPatchReader(
                os.path.join(d, "TCGA"), os.path.join(d, "TCGA", "wsi"),
                config.fixdim)
        else:
            self.read_feature = _H5FeatureReader(
                os.path.join(d, "TCGA", f"Res50_feature_{config.fixdim}_fixdim0_norm"))
        self.gene_root = os.path.join(d, "TCGA", "transcriptomeProfiling_geneExpression")

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.rows[index]
        wsi = self.read_feature(row[1]).astype(np.float32)
        omic, tumor, immune = self._genes(row)
        return {"x_path": wsi, "x_omic": omic, "x_omic_tumor": tumor,
                "x_omic_immune": immune, "labels": self._labels(row)}

    def _genes(self, row):
        import pandas as pd

        path = os.path.join(self.gene_root, str(row[11]), str(row[12]))
        df = pd.read_table(path, skiprows=1)
        df = df.drop_duplicates(subset=["gene_name"], keep="first")

        def pick(sig):
            sel = df[df["gene_name"].isin(sig["gene_symbol"].values.tolist())]
            return sel["fpkm_uq_unstranded"].values.astype(np.float32)

        return pick(self.share), pick(self.share_tumor), pick(self.share_immune)

    def _labels(self, row) -> np.ndarray:
        idh = 0 if row[4] == "WT" else 1
        codel = 1 if row[5] == "codel" else 0
        cdkn = 1 if row[6] in (-2, -1) else 0
        his_map = {"oligoastrocytoma": 0, "astrocytoma": 1, "oligodendroglioma": 2,
                   "glioblastoma": 3}
        his = his_map.get(row[2], 0)
        his2 = 1 if row[2] == "glioblastoma" else 0
        grade = _grade_label(row[3])
        diag, subtype = _diag_labels(row[4], row[5], row[6], row[3])
        t = float(row[-1])
        surv_bin = _survival_bin(t, self.quantiles)
        dead = row[-2] == 1
        censor, event = (0, 1) if dead else (1, 0)
        return np.asarray([idh, codel, cdkn, his, grade, diag, his2, subtype,
                           surv_bin, censor, event, t], dtype=np.float32)
