"""Driver entry points must always compile and run."""

import importlib.util
import os

import jax
import numpy as np

_spec = importlib.util.spec_from_file_location(
    "graft_entry", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py")
)
graft = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(graft)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    chunk = np.asarray(out[0])
    assert chunk.shape == (256, 12000)
    assert chunk.dtype == np.int8
    assert np.abs(chunk.astype(np.int32)).max() > 0


def test_dryrun_multichip_virtual_mesh():
    n = len(jax.devices())
    graft.dryrun_multichip(n)
