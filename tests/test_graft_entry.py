"""Driver entry points: entry() is jittable, dryrun_multichip(8) runs a full
sharded train step. Guards the round-level MULTICHIP check (driver contract)."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_8():
    # conftest forces 8 virtual CPU devices, so this takes the in-process path
    graft.dryrun_multichip(8)


def test_dryrun_multichip_subprocess_fallback():
    # the backend is already initialized here with 8 devices, so asking for more
    # than the live count must route through the clean-subprocess bootstrap
    if len(jax.devices()) >= 16:
        pytest.skip("backend already has >=16 devices")
    graft._dryrun_multichip_subprocess(2)


def test_entry_traces():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape[0] == args[0].shape[0]
