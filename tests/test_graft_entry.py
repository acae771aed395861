"""Driver contract: __graft_entry__.entry() jits; dryrun_multichip(8) runs."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, (variables, batch) = g.entry()
    logits = jax.jit(fn)(variables, batch)
    # two legs: flagship (XLA φ+pool) and width-512 (fused Pallas on TPU)
    assert logits.shape == (batch["y"].shape[0], 2)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally on finite loss
