"""Multi-chip validation: the full SPMD training step on an 8-device mesh.

Runs ``__graft_entry__.dryrun_multichip`` in-process (the conftest already
forces an 8-device CPU platform), exactly what the driver executes.
"""
import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, (variables, batch) = g.entry()
    out = jax.jit(fn)(variables, batch)
    assert out["encoding_hand"].shape[0] == batch["rgb"].shape[0]
