"""The driver's multi-chip dry run must stay green on the virtual mesh."""

import __graft_entry__


def test_dryrun_multichip_8():
    # conftest already pinned 8 virtual CPU devices before jax imported;
    # dryrun_multichip's own env setup is then a no-op.
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import numpy as np

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ids, scores = (np.asarray(o) for o in out)
    assert ids.shape == scores.shape == (args[0].shape[0],)
