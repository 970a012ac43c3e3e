"""Guard the driver contract: entry() compiles and runs; dryrun_multichip
executes the fully-sharded step on the virtual 8-device mesh."""

import jax
import numpy as np
import pytest

import __graft_entry__ as g


def test_entry_compiles_and_runs():
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    p4 = np.asarray(out["point4"])
    assert p4.shape[-1] == 4
    assert np.asarray(out["valid"]).any()
    assert np.isfinite(p4[np.asarray(out["valid"])]).all()


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    g.dryrun_multichip(8)
