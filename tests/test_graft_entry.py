"""Driver contract: __graft_entry__.entry() jits; dryrun_multichip(8) runs."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, (variables, batches) = g.entry()
    logits = jax.jit(fn)(variables, batches)
    # three legs: flagship (XLA φ+pool, flat wire), width-512 (fused
    # Pallas on TPU), and the flagship on the dense per-cloud-row wire
    assert logits.shape == (batches[0]["y"].shape[0], 3)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally on finite loss
