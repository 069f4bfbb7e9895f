import jax
import numpy as np


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    for k, v in out.items():
        assert np.isfinite(float(v)), k


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices
    ge.dryrun_multichip(8)
