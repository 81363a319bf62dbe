import numpy as np


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    d, i = jax.jit(fn)(*args)
    assert np.asarray(d).shape == (16, 10)
    assert np.asarray(i).shape == (16, 10)
    assert np.all(np.diff(np.asarray(d), axis=1) >= -1e-5)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally
