"""Multi-device sharded step (the driver's dryrun contract) as a test on
the 8-device virtual CPU mesh."""

import jax
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (64,)
