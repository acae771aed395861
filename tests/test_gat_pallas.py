"""Fused flash-GAT attention kernel (ops/gat_pallas.py) vs the XLA oracle.

Kernel runs in Pallas interpreter mode on CPU; the oracle
(`gat_attention_xla`, the masked [B, M, M] matrix formulation) is itself
pinned against the flat segment-softmax GAT by tests/test_dense_graph.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_classifier_tpu.ops.gat_pallas import (
    gat_attention,
    gat_attention_fused,
    gat_attention_xla,
)


def _inputs(seed=0, b=3, m=64, d=4, h=4, dh=8, frac=0.5):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, m, h)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, m, h)).astype(np.float32)),
        jnp.asarray(rng.integers(0, m, size=(b, m, d)).astype(np.int32)),
        jnp.asarray(
            (rng.random((b, m, d)) * (rng.random((b, m, d)) < frac)).astype(
                np.float32
            )
        ),
        jnp.asarray(rng.normal(size=(b, m, h * dh)).astype(np.float32)),
    )


@pytest.mark.parametrize("form", ["slot", "dense"])
@pytest.mark.parametrize("slope", [0.2, 0.01])
def test_kernel_forward_matches_oracle(monkeypatch, slope, form):
    """Both kernel forms (PCC_GAT_KERNEL): the slot-softmax default and
    the dense [T, M] row-softmax fallback.  The random in_src draws
    include duplicate sources and explicit self-edges, so the slot
    form's dedupe/self-collapse must match the oracle's adj|eye mask."""
    monkeypatch.setenv("PCC_GAT_KERNEL", form)
    s_dst, s_src, in_src, in_w, xw = _inputs()
    want = gat_attention_xla(s_dst, s_src, in_src, in_w, xw, slope)
    got = gat_attention_fused(s_dst, s_src, in_src, in_w, xw, slope, True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("gb", ["1", "4"])
def test_gb_knob_keeps_slot_kernel_exact(monkeypatch, gb):
    """PCC_GAT_GB (graphs-per-grid-step unroll cap, scripts A/B knob)
    must not change numerics: the unroll only re-batches the grid."""
    monkeypatch.setenv("PCC_GAT_KERNEL", "slot")
    monkeypatch.setenv("PCC_GAT_GB", gb)
    s_dst, s_src, in_src, in_w, xw = _inputs(b=4)
    want = gat_attention_xla(s_dst, s_src, in_src, in_w, xw, 0.2)
    got = gat_attention_fused(s_dst, s_src, in_src, in_w, xw, 0.2, True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("chunk", ["on", "off"])
def test_score_chunk_knob_keeps_slot_kernel_exact(monkeypatch, chunk):
    """PCC_GAT_SCORE_CHUNK (128-lane-chunked score gathers, see
    `_score_chunk`) must not change numerics: each chunk dot contracts
    the same f32 rows, only the lane tiling of the one-hot differs.
    M=288 exercises the remainder chunk (128+128+32)."""
    monkeypatch.setenv("PCC_GAT_KERNEL", "slot")
    monkeypatch.setenv("PCC_GAT_SCORE_CHUNK", chunk)
    s_dst, s_src, in_src, in_w, xw = _inputs(seed=5, b=2, m=288)
    want = gat_attention_xla(s_dst, s_src, in_src, in_w, xw, 0.2)
    got = gat_attention_fused(s_dst, s_src, in_src, in_w, xw, 0.2, True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("dal", ["t", "row"])
def test_dal_knob_keeps_slot_backward_exact(monkeypatch, dal):
    """PCC_GAT_DAL (transposed-vs-row dalpha dots in the slot backward,
    see `_dal_transposed`) must not change numerics: both forms contract
    the identical f32 products over C, only the MXU orientation (and the
    deleted result transpose) differ.  Gradient-level check against the
    XLA oracle's vjp on all five operand cotangents."""
    monkeypatch.setenv("PCC_GAT_KERNEL", "slot")
    monkeypatch.setenv("PCC_GAT_DAL", dal)
    s_dst, s_src, in_src, in_w, xw = _inputs(seed=11, b=2)
    rng = np.random.default_rng(13)
    cot = jnp.asarray(rng.normal(size=xw.shape).astype(np.float32))

    def loss(fn, *extra):
        return lambda sd, ss, x: jnp.sum(
            fn(sd, ss, in_src, in_w, x, *extra) * cot
        )

    want = jax.grad(loss(gat_attention_xla, 0.2), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    got = jax.grad(loss(gat_attention_fused, 0.2, True), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    for w, g in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize(
    "knobs",
    [
        {"PCC_GAT_DAL": "t", "PCC_GAT_SCORE_CHUNK": "on"},
        {"PCC_GAT_DAL": "t", "PCC_GAT_GB": "2"},
        {"PCC_GAT_DAL": "row", "PCC_GAT_SCORE_CHUNK": "on", "PCC_GAT_GB": "2"},
    ],
    ids=["dal-t+chunk", "dal-t+gb2", "dal-row+chunk+gb2"],
)
def test_gat_knob_combinations_keep_grads_exact(monkeypatch, knobs):
    """Knob COMBINATIONS the A/B scripts can compose (dal form ×
    score-chunk × gb) must keep gradient parity with the oracle — a
    device A/B must never pick a numerically wrong configuration (the
    φ-kernel suite pins the same invariant for its knob family)."""
    monkeypatch.setenv("PCC_GAT_KERNEL", "slot")
    for k, v in knobs.items():
        monkeypatch.setenv(k, v)
    s_dst, s_src, in_src, in_w, xw = _inputs(seed=17, b=4)
    rng = np.random.default_rng(19)
    cot = jnp.asarray(rng.normal(size=xw.shape).astype(np.float32))

    def loss(fn, *extra):
        return lambda sd, ss, x: jnp.sum(
            fn(sd, ss, in_src, in_w, x, *extra) * cot
        )

    want = jax.grad(loss(gat_attention_xla, 0.2), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    got = jax.grad(loss(gat_attention_fused, 0.2, True), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    for w, g in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize("form", ["slot", "dense"])
@pytest.mark.parametrize("m", [72, 288])
def test_kernel_at_rung_m_matches_oracle(monkeypatch, m, form):
    """Non-pow2 rung-ladder M (the loader's PRODUCTION node bucketing —
    k*2^j shapes like 288) through both kernel forms, forward AND
    gradients: _shapes_ok admits any 8-aligned M since the rung
    relaxation, so the kernels must be exercised off the pow2 lattice."""
    monkeypatch.setenv("PCC_GAT_KERNEL", form)
    s_dst, s_src, in_src, in_w, xw = _inputs(seed=3, b=2, m=m)
    want = gat_attention_xla(s_dst, s_src, in_src, in_w, xw, 0.2)
    got = gat_attention_fused(s_dst, s_src, in_src, in_w, xw, 0.2, True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5
    )
    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.normal(size=xw.shape).astype(np.float32))

    def loss(fn, *extra):
        return lambda sd, ss, x: jnp.sum(
            fn(sd, ss, in_src, in_w, x, *extra) * cot
        )

    g1 = jax.grad(loss(gat_attention_fused, 0.2, True), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    g2 = jax.grad(loss(gat_attention_xla, 0.2), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("form", ["slot", "dense"])
def test_kernel_gradients_match_oracle(monkeypatch, form):
    monkeypatch.setenv("PCC_GAT_KERNEL", form)
    s_dst, s_src, in_src, in_w, xw = _inputs(seed=1)
    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.normal(size=xw.shape).astype(np.float32))

    def loss(fn, *extra):
        return lambda sd, ss, x: jnp.sum(
            fn(sd, ss, in_src, in_w, x, *extra) * cot
        )

    g1 = jax.grad(loss(gat_attention_fused, 0.2, True), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    g2 = jax.grad(loss(gat_attention_xla, 0.2), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_graph_batched_grid_matches_oracle():
    """b=8, m=64 routes through the G-graphs-per-grid-step unroll
    (_graphs_per_step returns 8 when t == m and 8 | b) — both directions."""
    from point_cloud_classifier_tpu.ops.gat_pallas import _graphs_per_step

    s_dst, s_src, in_src, in_w, xw = _inputs(seed=3, b=8)
    assert _graphs_per_step(8, 64, xw.shape[-1], 64) > 1
    want = gat_attention_xla(s_dst, s_src, in_src, in_w, xw)
    got = gat_attention_fused(s_dst, s_src, in_src, in_w, xw, 0.2, True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5
    )

    rng = np.random.default_rng(11)
    cot = jnp.asarray(rng.normal(size=xw.shape).astype(np.float32))

    def loss(fn, *extra):
        return lambda sd, ss, x: jnp.sum(
            fn(sd, ss, in_src, in_w, x, *extra) * cot
        )

    g1 = jax.grad(loss(gat_attention_fused, 0.2, True), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    g2 = jax.grad(loss(gat_attention_xla, 0.2), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_slot_form_dedupes_wide_inrow_lists(monkeypatch):
    """D=8 with sources drawn from a tiny id pool: most rows carry
    duplicate slots and self-edges, so the slot form's pairwise dedupe
    chain (first valid occurrence wins) must reproduce the oracle's
    count-once bool-mask semantics — forward and gradients."""
    monkeypatch.setenv("PCC_GAT_KERNEL", "slot")
    rng = np.random.default_rng(7)
    b, m, d, h, dh = 2, 32, 8, 2, 8
    s_dst = jnp.asarray(rng.normal(size=(b, m, h)).astype(np.float32))
    s_src = jnp.asarray(rng.normal(size=(b, m, h)).astype(np.float32))
    in_src = jnp.asarray(rng.integers(0, 6, size=(b, m, d)).astype(np.int32))
    in_w = jnp.asarray(
        (rng.random((b, m, d)) * (rng.random((b, m, d)) < 0.7)).astype(
            np.float32
        )
    )
    xw = jnp.asarray(rng.normal(size=(b, m, h * dh)).astype(np.float32))
    want = gat_attention_xla(s_dst, s_src, in_src, in_w, xw)
    got = gat_attention_fused(s_dst, s_src, in_src, in_w, xw, 0.2, True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5
    )

    cot = jnp.asarray(rng.normal(size=xw.shape).astype(np.float32))
    loss = lambda fn, *e: (
        lambda sd, ss, x: jnp.sum(fn(sd, ss, in_src, in_w, x, *e) * cot)
    )
    g1 = jax.grad(loss(gat_attention_fused, 0.2, True), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    g2 = jax.grad(loss(gat_attention_xla, 0.2), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
        )


def test_isolated_nodes_attend_to_self_only():
    """A node with no incoming edges must softmax entirely onto its
    self-loop (torch_geometric add_self_loops semantics)."""
    s_dst, s_src, in_src, in_w, xw = _inputs(seed=2, frac=0.0)  # all padding
    got = gat_attention_fused(s_dst, s_src, in_src, in_w, xw, 0.2, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(xw), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("form", ["slot", "dense"])
def test_sag_masked_wire_matches_oracle(monkeypatch, form):
    """The SAG-masked wire (in_w zeroed for every edge touching a dropped
    node — models/graph_net._dense_forward's inrow_gat+SAG path) must
    match the oracle on the same masked wire, forward AND gradients:
    dropped rows keep only their self-loop, survivors lose dropped
    neighbours."""
    monkeypatch.setenv("PCC_GAT_KERNEL", form)
    s_dst, s_src, in_src, in_w, xw = _inputs(seed=5)
    rng = np.random.default_rng(11)
    keep = jnp.asarray((rng.random(s_dst.shape[:2]) < 0.5).astype(np.float32))
    keep_src = jnp.take_along_axis(
        keep, in_src.reshape(in_src.shape[0], -1), axis=1
    ).reshape(in_src.shape)
    in_w = in_w * keep_src * keep[:, :, None]

    def loss(fn, *a):
        return jnp.sum(fn(s_dst, s_src, in_src, in_w, a[0], 0.2, *a[1:]) ** 2)

    want, wgrad = jax.value_and_grad(lambda x: loss(gat_attention_xla, x))(xw)
    got, ggrad = jax.value_and_grad(
        lambda x: loss(gat_attention_fused, x, True)
    )(xw)
    np.testing.assert_allclose(float(want), float(got), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(wgrad), np.asarray(ggrad), rtol=1e-4, atol=1e-5
    )


def test_dispatch_falls_back_for_untileable_shapes():
    # m=52 is not 8-aligned → the dispatcher must use the oracle (any
    # 8-aligned M tiles since the rung-ladder relaxation; pow2 no longer
    # required)
    s_dst, s_src, in_src, in_w, xw = _inputs(m=52)
    want = gat_attention_xla(s_dst, s_src, in_src, in_w, xw)
    got = gat_attention(s_dst, s_src, in_src, in_w, xw)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("form", ["factored", "max"])
def test_both_softmax_forms_match_oracle(monkeypatch, form):
    """The device A/B (scripts/ab_session.sh rows gat_factored/gat_maxform)
    toggles PCC_GAT_SOFTMAX between the factorized outer-product softmax and
    the row-max form — both must match the oracle in forward AND gradients
    so the A/B can never pick a numerically wrong configuration.  The knob
    is read at trace time inside ``_alpha_tile``."""
    monkeypatch.setenv("PCC_GAT_SOFTMAX", form)
    monkeypatch.setenv("PCC_GAT_KERNEL", "dense")  # the knob is dense-only
    s_dst, s_src, in_src, in_w, xw = _inputs(seed=3)
    want = gat_attention_xla(s_dst, s_src, in_src, in_w, xw, 0.2)
    got = gat_attention_fused(s_dst, s_src, in_src, in_w, xw, 0.2, True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5
    )

    rng = np.random.default_rng(11)
    cot = jnp.asarray(rng.normal(size=xw.shape).astype(np.float32))

    def loss(fn, *extra):
        return lambda sd, ss, x: jnp.sum(
            fn(sd, ss, in_src, in_w, x, *extra) * cot
        )

    g1 = jax.grad(loss(gat_attention_fused, 0.2, True), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    g2 = jax.grad(loss(gat_attention_xla, 0.2), argnums=(0, 1, 2))(
        s_dst, s_src, xw
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_kernel_under_vmap_matches_oracle():
    """Vmapped-arm sweeps (parallel/vmap_sweep.py) trace the kernel under
    jax.vmap with params batched over the arm axis and the wire shared —
    JAX's pallas batching rule must reproduce per-arm oracle results
    (verified on real TPU 2026-08-18; pinned here in interpret mode)."""
    arms = 3
    per = [_inputs(seed=100 + a) for a in range(arms)]
    s_dst = jnp.stack([p[0] for p in per])
    s_src = jnp.stack([p[1] for p in per])
    xw = jnp.stack([p[4] for p in per])
    in_src, in_w = per[0][2], per[0][3]  # shared wire

    f = jax.vmap(
        lambda sd, ss, x: gat_attention_fused(sd, ss, in_src, in_w, x, 0.2, True)
    )
    got = f(s_dst, s_src, xw)
    for a in range(arms):
        want = gat_attention_xla(s_dst[a], s_src[a], in_src, in_w, xw[a], 0.2)
        np.testing.assert_allclose(
            np.asarray(want), np.asarray(got[a]), rtol=1e-5, atol=1e-5
        )


def test_tile_rows_finds_non_halving_divisors():
    """The tile search must not strand rung shapes whose halving chain
    exits the 8-aligned lattice: m=288 under a tight budget has no
    8-aligned tile on the 288→144→72→36 halving chain below 72, but
    48/24/16/8 all divide 288."""
    from point_cloud_classifier_tpu.ops.gat_pallas import _tile_rows

    # huge c shrinks the VMEM budget below 72 rows
    t = _tile_rows(288, 2048)
    assert t > 0 and 288 % t == 0 and t % 8 == 0, t
    # ample budget: whole-graph tile preferred (enables the G-unroll)
    assert _tile_rows(288, 128) == 288
    assert _tile_rows(512, 128) == 512
    # budget below any tile -> kernel gated off
    assert _tile_rows(4096, 4096) == 0
