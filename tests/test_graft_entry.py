"""CI gate for the driver-executed entry file.

Round-1 lesson: ``__graft_entry__.py`` was the only file the driver runs and
the only file CI never imported — a refactor broke ``dryrun_multichip`` and
no test caught it (VERDICT round 1, item 1).  These tests call both entry
points exactly the way the driver does, on the virtual CPU mesh.
"""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    y = jax.jit(fn)(*args)
    jax.block_until_ready(y)
    assert y.ndim == 1 and y.shape[0] > 0


@pytest.mark.slow
def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


@pytest.mark.slow
def test_dryrun_multichip_8():
    # The driver invokes with 8 virtual devices; mirror it exactly.
    graft.dryrun_multichip(8)
