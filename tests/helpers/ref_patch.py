"""Harness-only source patch of the reference deform stack's hard-coded shapes.

The reference hard-codes N=2500 / a 50x50 grid (``models/DeformCrossTransMIL.py:104``,
``models/DeformableAttention2D.py:239-240,318``), which makes torch-vs-sml_tpu A/B and
gradient-parity runs at that shape prohibitively slow on this 1-core host.  This
helper execs source-transformed SHADOW copies of the two modules with those constants
replaced by a small N/grid, so powered comparisons can run at e.g. N=256.  Nothing
here enters the framework — it only reshapes the reference for test harnesses.

Requires tests to have already run ``_stub_modules()`` (puts /root/reference on
sys.path and stubs its optional deps).
"""

from __future__ import annotations

import types

REF_MODELS = "/root/reference/models"


def load_patched_deform(n: int = 256, grid: int = 16):
    """Return a patched ``DeformCrossTransMIL`` class operating at ``n = grid**2``.

    Use with ``monkeypatch.setattr(models.model, "DeformCrossTransMIL", cls)``
    before constructing ``DeformPathomicNet`` (``model.py:453-454`` resolves the
    name at call time).
    """
    assert grid * grid == n, "reference requires a perfect-square bag"

    with open(f"{REF_MODELS}/DeformableAttention2D.py") as f:
        src_da = f.read()
    patched_da = (src_da
                  .replace("x1.shape[1], 50, 50", f"x1.shape[1], {grid}, {grid}")
                  .replace("x2.shape[1], 50, 50", f"x2.shape[1], {grid}, {grid}")
                  .replace("out.shape[1], 2500", f"out.shape[1], {n}"))
    assert patched_da != src_da
    mod_da = types.ModuleType("ref_patched_deformable_attention_2d")
    mod_da.__file__ = f"{REF_MODELS}/DeformableAttention2D.py"
    exec(compile(patched_da, mod_da.__file__, "exec"), mod_da.__dict__)

    with open(f"{REF_MODELS}/DeformCrossTransMIL.py") as f:
        src_ct = f.read()
    patched_ct = (src_ct
                  .replace("repeat(1, 2500, 1)", f"repeat(1, {n}, 1)")
                  # absolute imports so the shadow module execs standalone
                  .replace("from .DeformableAttention2D import",
                           "from models.DeformableAttention2D import")
                  .replace("from .DeformableAttention1D import",
                           "from models.DeformableAttention1D import"))
    assert "repeat(1, 2500, 1)" not in patched_ct
    mod_ct = types.ModuleType("ref_patched_deform_cross_transmil")
    mod_ct.__file__ = f"{REF_MODELS}/DeformCrossTransMIL.py"
    exec(compile(patched_ct, mod_ct.__file__, "exec"), mod_ct.__dict__)
    # rebind the 2-D attention to the patched grid (resolved from module
    # globals at construction time)
    mod_ct.DeformCrossAttention2D = mod_da.DeformCrossAttention2D
    return mod_ct.DeformCrossTransMIL
