"""Fake-corpus dress rehearsal of the REAL data path, CLI level (VERDICT r4
item 6): ``main.py`` trains the pathomic fusion model over the HDF5+CSV fixture tree the
real readers parse (IvYGAP fpkm join + TCGA GDC TSV join), saves checkpoints,
and ``inference.py --attribution ablation`` reloads the best checkpoint and
writes the per-gene CSV — the full reference workflow
(``/root/reference/main.py`` -> ``data/dataset.py:121-135`` ->
``inference.py``) end-to-end on generated data.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_data import _write_fake_corpus  # noqa: E402


@pytest.mark.slow
def test_cli_train_then_attribution_on_fake_corpus(tmp_path):
    import main as main_mod
    import inference as inf_mod

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    _write_fake_corpus(corpus, fixdim=16, n_patients=16)
    ck = str(tmp_path / "ckpts")

    flags = ["--dataset", "both", "--dataDir", corpus + "/",
             "--fixdim", "16",
             "--input_size_omic", "12", "--input_size_omic_tumor", "5",
             "--input_size_omic_immune", "7",
             "--batch_size", "8", "--mode", "pathomic",
             "--task_type", "diag2021", "--checkpoints", ck, "--debug"]

    assert main_mod.main(flags + ["--epochs", "3"]) == 0
    names = os.listdir(ck)
    assert "best_modal" in names and "last_state" in names
    assert any(n.startswith("epoch_") for n in names)

    assert inf_mod.main(flags + ["--model_fp", os.path.join(ck, "best_modal"),
                                 "--attribution", "ablation"]) == 0
    csv = os.path.join(ck, "difference_acc_list.csv")  # reference filename
    assert os.path.exists(csv)
    lines = open(csv).read().strip().splitlines()
    assert len(lines) == 13  # header + all 12 genes (reference truncates to 2)
    # every row parses as (gene_index, acc_drop)
    vals = np.array([float(ln.split(",")[1]) for ln in lines[1:]])
    assert np.isfinite(vals).all()
