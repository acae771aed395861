"""Device-resident dataset cache (data/resident.py) and its trainer path."""

import numpy as np
import pytest

from point_cloud_classifier_tpu.data.resident import ResidentCache
from point_cloud_classifier_tpu.models import FullyConnectedNet, ModelWrapper
from point_cloud_classifier_tpu.parallel import make_mesh
from tests.test_parallel import _tabular_batch


class CountingLoader:
    """Re-iterable loader that counts full passes over the source."""

    def __init__(self, batches):
        self.batches = batches
        self.passes = 0

    def __iter__(self):
        self.passes += 1
        yield from self.batches


def test_cache_uploads_once_and_replays_exactly():
    src = CountingLoader([_tabular_batch(seed=s) for s in range(4)])
    cache = ResidentCache(src)
    first = [{k: np.asarray(v) for k, v in b.items()} for b in cache]
    assert src.passes == 1 and cache.cached
    for _ in range(2):  # later epochs never touch the loader
        replay = [{k: np.asarray(v) for k, v in b.items()} for b in cache]
        assert src.passes == 1
        for a, b in zip(first, replay):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


def test_cache_shuffles_batch_order_across_epochs():
    batches = [_tabular_batch(seed=s) for s in range(6)]
    cache = ResidentCache(batches, shuffle_seed=0)
    list(cache)  # epoch 1: upload in order
    e2 = [np.asarray(b["x"]) for b in cache]
    e3 = [np.asarray(b["x"]) for b in cache]
    as_keys = lambda ep: sorted(a.tobytes() for a in ep)
    assert as_keys(e2) == as_keys(e3)  # same batches...
    assert [a.tobytes() for a in e2] != [a.tobytes() for a in e3]  # ...new order


def test_cache_block_shuffle_keeps_window_composition():
    """shuffle_block=K permutes K-sized blocks whole: every epoch's order
    is a permutation of the SAME K-windows (intra-block order fixed,
    partial tail block last) — the invariant the fused trainer's window
    memo relies on (wrapper._prestack_window)."""
    batches = [_tabular_batch(seed=s) for s in range(17)]  # 8 blocks + tail
    cache = ResidentCache(batches, shuffle_seed=0, shuffle_block=2)
    list(cache)  # upload pass
    key = lambda b: np.asarray(b["x"]).tobytes()
    base_windows = {
        (key(batches[i]), key(batches[i + 1])) for i in range(0, 16, 2)
    }
    orders = []
    for _ in range(4):
        ep = [key(b) for b in cache]
        assert ep[-1] == key(batches[16])  # tail block stays last
        windows = {tuple(ep[i : i + 2]) for i in range(0, 16, 2)}
        assert windows == base_windows  # composition stable, order free
        orders.append(tuple(ep))
    assert len(set(orders)) > 1  # ...and the block order does shuffle


def test_cache_epoch_offset_resumes_shuffle_sequence():
    """A resumed run's cache (epoch_offset=N) must continue the shuffle
    sequence where the crashed run left off, not replay epochs 1..N's
    permutations (code-review finding; fit() passes its start epoch)."""
    batches = [_tabular_batch(seed=s) for s in range(6)]
    fresh = ResidentCache(batches, shuffle_seed=0)
    orders = []
    for _ in range(4):  # epochs 1-4 of an uninterrupted run
        orders.append([np.asarray(b["x"]).tobytes() for b in fresh])
    resumed = ResidentCache(batches, shuffle_seed=0, epoch_offset=2)
    # the resumed cache's FIRST pass is its upload pass (loader order,
    # like any first pass); from the next epoch on the permutations are
    # keyed on the ABSOLUTE epoch, i.e. epoch 4 matches epoch 4
    r3 = [np.asarray(b["x"]).tobytes() for b in resumed]
    r4 = [np.asarray(b["x"]).tobytes() for b in resumed]
    assert r3 == orders[0]  # upload pass streams in loader order
    assert r4 == orders[3]  # continues the sequence, not a replay of e2


def test_chunked_upload_matches_per_batch_upload_exactly():
    """Stacked chunk upload (one device_put + one jitted split per chunk)
    must reproduce the per-batch upload byte-for-byte, across mixed shapes
    (shape changes force chunk flushes)."""
    batches = [_tabular_batch(seed=s) for s in range(5)]
    small = {k: np.asarray(v)[:3] for k, v in _tabular_batch(seed=9).items()}
    batches.insert(2, small)  # mid-run shape change
    a = ResidentCache(list(batches), upload_chunk=4)
    b = ResidentCache(list(batches), upload_chunk=1)
    ea = [{k: np.asarray(v) for k, v in x.items()} for x in a]
    eb = [{k: np.asarray(v) for k, v in x.items()} for x in b]
    assert a.cached and b.cached and len(ea) == len(eb) == 6
    for xa, xb in zip(ea, eb):
        for k in xa:
            np.testing.assert_array_equal(xa[k], xb[k])
    # replay epoch is identical too
    for xa, xb in zip(a, eb):
        for k in xb:
            np.testing.assert_array_equal(np.asarray(xa[k]), xb[k])


def test_chunked_upload_batches_transfers(monkeypatch):
    """8 same-shape batches at upload_chunk=4 ship as 2 stacked device_puts,
    not 8 per-batch ones — the whole point of the chunked path (per-batch
    H2D stalls dominated resident cold-start on tunneled backends)."""
    import jax as _jax

    from point_cloud_classifier_tpu.data import resident as mod

    calls = []
    real = _jax.device_put
    monkeypatch.setattr(mod.jax, "device_put", lambda x: calls.append(1) or real(x))
    batches = [_tabular_batch(seed=s) for s in range(8)]
    cache = mod.ResidentCache(batches, upload_chunk=4)
    assert len(list(cache)) == 8 and cache.cached
    assert len(calls) == 2


def test_chunked_upload_budget_trip_mid_chunk_streams_everything():
    """Budget tripping while a chunk is still host-held must yield the held
    batches (placed) plus the rest — no batch lost, streaming thereafter."""
    batches = [_tabular_batch(seed=s) for s in range(6)]
    per = sum(np.asarray(v).nbytes for v in batches[0].values())
    src = CountingLoader(batches)
    # budget passes 3 batches, trips on the 4th (inside the first chunk of 8)
    cache = ResidentCache(src, budget_bytes=int(per * 3.5), upload_chunk=8)
    for epoch in range(1, 3):
        got = list(cache)
        assert len(got) == 6 and src.passes == epoch
    assert not cache.cached


def test_cache_budget_falls_back_to_streaming():
    src = CountingLoader([_tabular_batch(seed=s) for s in range(4)])
    cache = ResidentCache(src, budget_bytes=1)  # everything is over budget
    for epoch in range(1, 3):
        got = list(cache)
        assert len(got) == 4
        assert src.passes == epoch  # streams every epoch
    assert not cache.cached


def test_cache_with_mesh_places_data_shardings():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()
    cache = ResidentCache([_tabular_batch()], mesh=mesh)
    (b1,) = list(cache)
    assert b1["x"].sharding.spec == P("data", None)
    (b2,) = list(cache)
    assert b2["x"].sharding.spec == P("data", None)


def test_abandoned_cache_still_places_shardings():
    """ADVICE r1: the over-budget fallback must keep the streaming
    pipeline's placement — batches yielded after abandonment (and on every
    later epoch) still go through shard_batch under a mesh."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()
    src = CountingLoader([_tabular_batch(seed=s) for s in range(3)])
    cache = ResidentCache(src, mesh=mesh, budget_bytes=1)
    for epoch in range(1, 3):
        got = list(cache)
        assert len(got) == 3 and src.passes == epoch
        for b in got:
            assert b["x"].sharding.spec == P("data", None)
    assert not cache.cached


def test_resident_fit_matches_streaming_fit_exactly():
    """Resident training == streaming training fed the same replay order.

    fit() hands the cache ``shuffle_seed=wrapper.seed``, so epoch 1 streams
    in loader order and epoch e ≥ 2 replays under
    ``default_rng(seed + e).permutation`` (data/resident.py) — the streaming
    oracle below reproduces that order explicitly.
    """
    import jax

    train = [_tabular_batch(seed=s) for s in range(3)]
    val = [_tabular_batch(seed=9)]
    seed = 0

    class ReplayOrderLoader:
        """Streams the exact order ResidentCache(shuffle_seed=seed) yields."""

        def __init__(self, batches):
            self.batches = batches
            self._epoch = 0

        def __iter__(self):
            self._epoch += 1
            order = range(len(self.batches))
            if self._epoch >= 2:
                order = np.random.default_rng(seed + self._epoch).permutation(
                    len(self.batches)
                )
            for i in order:
                yield self.batches[i]

    def run(resident):
        model = FullyConnectedNet(
            input_dim=9, hidden_layers=[8], batch_normalization=True, output_dim=1
        )
        w = ModelWrapper(
            model, learning_rate=1e-2, epochs=3, seed=seed, device_resident=resident
        )
        w.fit(ReplayOrderLoader(train) if not resident else train, val)
        return w

    a, b = run(False), run(True)
    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for sa, sb in zip(jax.tree.leaves(a.batch_stats), jax.tree.leaves(b.batch_stats)):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_fused_tuple_path_matches_stacked():
    """The tuple-of-device-batches fused form (stacking INSIDE the jit —
    wrapper._stack_in_jit, used by the device-resident pipeline so a flush
    is ONE dispatch with zero eager stacks) matches the pre-stacked host
    form for both the train and eval fused steps.  One-ulp tolerance, not
    bitwise: the two input pytrees compile to different programs (stack
    inside vs outside), so XLA's fusion choices differ at float noise."""
    import jax

    train = [_tabular_batch(seed=s) for s in range(2)]

    def fresh():
        model = FullyConnectedNet(
            input_dim=9, hidden_layers=[8], batch_normalization=True, output_dim=1
        )
        w = ModelWrapper(model, learning_rate=1e-2, epochs=1, seed=0, fuse_steps=2)
        w._ensure_initialized(train[0])
        return w

    dev = tuple({k: jax.device_put(v) for k, v in b.items()} for b in train)
    stacked = {k: np.stack([b[k] for b in train]) for k in train[0]}

    wa, wb = fresh(), fresh()
    outs_a = wa._train_step_fused(wa.params, wa.batch_stats, wa.opt_state, dev)
    outs_b = wb._train_step_fused(wb.params, wb.batch_stats, wb.opt_state, stacked)
    for xa, xb in zip(jax.tree.leaves(outs_a[:3]), jax.tree.leaves(outs_b[:3])):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=1e-6, atol=1e-7
        )

    # the train call DONATED wa.params/batch_stats — use the returned state
    ea = wa._eval_step_fused(outs_a[0], outs_a[1], dev)
    eb = wb._eval_step_fused(outs_b[0], outs_b[1], stacked)
    for xa, xb in zip(jax.tree.leaves(ea), jax.tree.leaves(eb)):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=1e-6, atol=1e-7
        )


def test_prestacked_window_memo_matches_tuple_path():
    """Round 4: device-resident fused flushes reuse a MEMOIZED pre-stacked
    window (wrapper._prestack_window) instead of re-stacking the tuple
    inside the jit every flush (the in-jit concatenate re-copied the whole
    window through HBM — 9% of the flagship step, A/B'd 2026-08-20).
    Pins: (a) training through the memoized path matches the tuple-path
    run to float noise, (b) the memo actually HITS across epochs (one
    entry per window, no growth), (c) eval windows memoize too.  16 train
    batches at fuse 2 = 8 full blocks, the minimum for window-granular
    shuffle (fewer falls back to batch shuffle and the memo stands down —
    test_block_shuffle_falls_back_on_few_blocks; threshold raised 3→8 in
    round 5 per the advisor's shuffle-entropy finding)."""
    train = [_tabular_batch(seed=s) for s in range(16)]
    val = [_tabular_batch(seed=9), _tabular_batch(seed=10)]

    def run(disable_memo):
        model = FullyConnectedNet(
            input_dim=9, hidden_layers=[8], batch_normalization=True, output_dim=1
        )
        w = ModelWrapper(
            model, learning_rate=1e-2, epochs=4, seed=0,
            device_resident=True, fuse_steps=2,
        )
        if disable_memo:
            w._prestack_window = lambda pending, loader: None
        w.fit(train, val)
        memo_after_fit = len(w._window_memo)
        bytes_after_fit = w._window_memo_bytes
        _, probs = w.predict(val, return_prob=True)
        return w, probs, memo_after_fit, bytes_after_fit

    wa, probs_a, memo_a, bytes_a = run(disable_memo=False)
    wb, probs_b, memo_b, bytes_b = run(disable_memo=True)
    np.testing.assert_allclose(probs_a, probs_b, rtol=1e-5, atol=1e-6)
    for xa, xb in zip(
        __import__("jax").tree.leaves(wa.params),
        __import__("jax").tree.leaves(wb.params),
    ):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=1e-5, atol=1e-6
        )
    # 8 train windows + 1 fit-val window — and NOT (windows × epochs):
    # window-granular shuffle (shuffle_block=fuse_steps) keeps window
    # composition epoch-stable so replay epochs HIT the memo instead of
    # re-stacking (the streaming first pass rides the tuple path — see
    # replay_is_window_stable)
    assert memo_a == 9 and bytes_a > 0
    assert memo_b == 0 and bytes_b == 0
    # predict runs OUTSIDE fit, so its _eval_dispatch releases the fit
    # memo's pinned windows up front (advisor round-4 finding)
    assert len(wa._window_memo) == 0 and wa._window_memo_bytes == 0


def test_eval_memo_survives_same_loader_repeat_calls():
    """Round-5 review fix: the stale-window clear at standalone
    evaluate()/predict() entry is keyed on LOADER identity — a scoring
    loop hitting the same ResidentCache repeatedly must keep its window
    memo across calls (clearing unconditionally re-stacked every window
    through HBM on every request), while switching to a DIFFERENT loader
    still releases the previous loader's pinned windows up front."""
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=True, output_dim=1
    )
    w = ModelWrapper(
        model, learning_rate=1e-2, epochs=1, seed=0,
        device_resident=True, fuse_steps=2,
    )
    w.fit([_tabular_batch(seed=s) for s in range(4)])

    cache = ResidentCache([_tabular_batch(seed=s) for s in range(20, 24)])
    list(cache)  # upload pass (memo stands down until replay is stable)
    _, p1 = w.predict(cache, return_prob=True)
    assert len(w._window_memo) == 2 and w._memo_loader_id == id(cache)
    entries_after_first = dict(w._window_memo)
    _, p2 = w.predict(cache, return_prob=True)
    # same loader: the SAME memo entries survive and are reused
    assert dict(w._window_memo) == entries_after_first
    np.testing.assert_allclose(p1, p2, rtol=0, atol=0)

    other = ResidentCache([_tabular_batch(seed=s) for s in range(30, 34)])
    list(other)
    w.predict(other, return_prob=True)
    # new loader: old windows released, new loader's windows memoized
    assert w._memo_loader_id == id(other)
    assert not (set(w._window_memo) & set(entries_after_first))


def test_block_shuffle_falls_back_on_few_blocks():
    """With fewer than 8 full blocks, window-granular shuffle collapses
    toward degeneracy (3 blocks = 3! = 6 epoch orders, 1 block = the
    IDENTITY order every epoch — the silent-repeat failure shuffle_seed
    exists to prevent), so replay falls back to BATCH shuffle and
    replay_is_window_stable turns the memo off.  Threshold raised 3→8 in
    round 5 per the advisor's shuffle-entropy finding (the zero-cost
    quality A/B was measured at ~15 blocks, not near the old floor)."""
    batches = [_tabular_batch(seed=s) for s in range(6)]
    cache = ResidentCache(batches, shuffle_seed=0, shuffle_block=4)
    list(cache)  # upload pass
    assert not cache.replay_is_window_stable(4)
    key = lambda b: np.asarray(b["x"]).tobytes()
    orders = [tuple(key(b) for b in cache) for _ in range(4)]
    assert len(set(orders)) > 1  # NOT the identity order every epoch
    # ... and batch-level: some epoch must split a [0,1,2,3] block
    base_first_block = tuple(key(b) for b in batches[:4])
    assert any(o[:4] != base_first_block for o in orders)

    # 3 full blocks — enough under the OLD threshold, degenerate entropy
    # (3! = 6 epoch orders): must now fall back to batch shuffle too
    few = ResidentCache(batches, shuffle_seed=0, shuffle_block=2)
    list(few)
    assert not few.replay_is_window_stable(2)

    # enough blocks (8 full): window shuffle active and advertised stable
    many = [_tabular_batch(seed=s) for s in range(16)]
    stable = ResidentCache(many, shuffle_seed=0, shuffle_block=2)
    list(stable)
    assert stable.replay_is_window_stable(2)
    assert not stable.replay_is_window_stable(3)  # consumer fuse mismatch


def test_window_memo_budget_evicts_lru():
    """The memo honors the LOADER's budget_bytes (not the global default)
    and evicts oldest entries instead of pinning dead windows forever."""
    import jax

    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=True, output_dim=1
    )
    w = ModelWrapper(model, learning_rate=1e-2, epochs=1, seed=0, fuse_steps=2)
    batches = [_tabular_batch(seed=s) for s in range(8)]
    w._ensure_initialized(batches[0])
    one_window = 2 * sum(np.asarray(v).nbytes for v in batches[0].values())
    cache = ResidentCache(
        batches, budget_bytes=10 << 20, shuffle_seed=None
    )
    list(cache)  # pin
    # shrink the budget to ~2 windows AFTER pinning so only the memo is
    # constrained
    cache.budget_bytes = int(2.5 * one_window)
    dev = list(cache)
    for s in range(0, 8, 2):
        out = w._prestack_window(dev[s : s + 2], cache)
        assert out is not None
    assert len(w._window_memo) == 2  # 4 windows stacked, oldest 2 evicted
    assert w._window_memo_bytes <= cache.budget_bytes


def test_window_memo_oversized_window_keeps_existing_entries():
    """A single window larger than the whole budget is used once and never
    pinned — and must NOT flush the still-useful cached windows on its way
    through (advisor round-4 finding: the eviction loop used to run before
    the over-budget check, emptying the memo for an entry that was never
    inserted)."""
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=True, output_dim=1
    )
    w = ModelWrapper(model, learning_rate=1e-2, epochs=1, seed=0, fuse_steps=2)
    batches = [_tabular_batch(seed=s) for s in range(4)]
    w._ensure_initialized(batches[0])
    one_window = 2 * sum(np.asarray(v).nbytes for v in batches[0].values())
    cache = ResidentCache(batches, budget_bytes=10 << 20, shuffle_seed=None)
    list(cache)  # pin
    dev = list(cache)
    cache.budget_bytes = int(2.5 * one_window)
    assert w._prestack_window(dev[0:2], cache) is not None
    assert w._prestack_window(dev[2:4], cache) is not None
    assert len(w._window_memo) == 2
    # now shrink the budget below ONE window: the next stack is over
    # budget — returned for single use, existing entries untouched
    cache.budget_bytes = one_window // 2
    out = w._prestack_window(dev[0:2], cache)  # hits the existing entry
    assert out is not None and len(w._window_memo) == 2
    # force a fresh (non-hit) oversized stack via new device batches
    fresh = [cache._put(_tabular_batch(seed=s)) for s in (7, 8)]
    out = w._prestack_window(tuple(fresh), cache)
    assert out is not None
    assert len(w._window_memo) == 2  # memo NOT flushed, entry NOT added


def test_prestacked_window_memo_skips_streaming_loaders():
    """Streaming (non-resident) loaders yield fresh device dicts every
    epoch — memoization must not apply (unbounded growth otherwise)."""
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=True, output_dim=1
    )
    w = ModelWrapper(model, learning_rate=1e-2, epochs=2, seed=0, fuse_steps=2)
    train = [_tabular_batch(seed=s) for s in range(4)]
    w.fit(train)  # host batches: np.stack path, memo never consulted
    assert len(w._window_memo) == 0


def test_resident_fused_matches_sequential():
    """Device-resident + fuse_steps=K tracks the unfused run, including
    partial end-of-epoch flushes.  Tolerance is LOOSE by design: the
    scanned step and the standalone step compile to slightly different
    fusions (~1e-9 full-state noise per flush, measured), and adam's
    m/sqrt(v) normalization amplifies that over epochs — the test exists
    to catch order/drop/semantic bugs (O(1) divergence), with the
    close-match (one-ulp allclose) guarantee covered by
    test_fused_tuple_path_matches_stacked.  The train cache is pre-wrapped
    WITHOUT a shuffle seed so every fuse depth consumes the identical
    batch stream — fit()'s own wrapping shuffles at fuse-window
    granularity (shuffle_block=fuse_steps), which legitimately orders
    epochs differently across fuse depths."""
    train = [_tabular_batch(seed=s) for s in range(5)]
    val = [_tabular_batch(seed=9)]

    def run(fuse):
        model = FullyConnectedNet(
            input_dim=9, hidden_layers=[8], batch_normalization=True, output_dim=1
        )
        w = ModelWrapper(
            model, learning_rate=1e-2, epochs=3, seed=0,
            device_resident=True, fuse_steps=fuse,
        )
        w.fit(ResidentCache(train), val)
        _, probs = w.predict(val, return_prob=True)
        return probs

    np.testing.assert_allclose(run(1), run(2), rtol=2e-2, atol=5e-3)
    # fuse window larger than the epoch: one partial flush per epoch
    np.testing.assert_allclose(run(1), run(16), rtol=2e-2, atol=5e-3)


def test_resident_env_override(monkeypatch):
    monkeypatch.setenv("PCC_RESIDENT", "1")
    w = ModelWrapper(
        FullyConnectedNet(
            input_dim=9, hidden_layers=[8], batch_normalization=False, output_dim=1
        ),
        learning_rate=1e-2,
        epochs=1,
    )
    assert w.device_resident
    monkeypatch.setenv("PCC_RESIDENT", "0")
    w2 = ModelWrapper(
        FullyConnectedNet(
            input_dim=9, hidden_layers=[8], batch_normalization=False, output_dim=1
        ),
        learning_rate=1e-2,
        epochs=1,
        device_resident=True,
    )
    assert not w2.device_resident


def test_bench_smoke_resident_pipeline(capsys):
    import json

    import bench

    bench.main(["--smoke", "--pipeline", "resident"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["unit"] == "clouds/sec" and out["value"] > 0


def test_unstable_loader_clear_is_selective():
    """_prestack_window's unstable-loader branch drops only the CALLING
    loader's memo entries: an unstable train cache must not wipe the
    stable fit-val loader's live windows on every fused flush (round-5
    review finding — the old wholesale clear re-stacked val windows
    through HBM every epoch)."""
    w = ModelWrapper(
        FullyConnectedNet(
            input_dim=9, hidden_layers=[8], batch_normalization=True, output_dim=1
        ),
        learning_rate=1e-2, epochs=1, seed=0,
        device_resident=True, fuse_steps=2,
    )
    ca = ResidentCache([_tabular_batch(seed=s) for s in range(4)])
    la = list(ca)  # upload: replay windows now stable
    assert w._prestack_window(la[:2], ca) is not None
    assert w._prestack_window(la[2:], ca) is not None
    assert len(w._window_memo) == 2

    # an UNSTABLE other loader (first pass still streaming) flushes:
    # returns None (tuple path) and leaves ca's entries alone
    cb = ResidentCache([_tabular_batch(seed=s) for s in range(10, 14)])
    assert not cb.replay_is_window_stable(2)
    assert w._prestack_window(la[:2], cb) is None
    assert len(w._window_memo) == 2

    # once cb stabilizes its windows memoize alongside ca's...
    lb = list(cb)
    assert w._prestack_window(lb[:2], cb) is not None
    assert len(w._window_memo) == 3
    # ...and when cb turns unstable again (budget abandonment), only
    # ITS entry is dropped
    cb._abandoned = True
    assert w._prestack_window(lb[:2], cb) is None
    assert len(w._window_memo) == 2
    assert w._window_memo_bytes == sum(
        sum(int(v.nbytes) for v in entry[1].values())
        for entry in w._window_memo.values()
    )
