"""Pallas BEVPool v2 (ops/bev_pool_pallas.py) vs the XLA scatter-add path
(ops/bev_splat.bev_scatter_add): exact same pooled BEV features."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_pool_pallas import (
    bev_pool_rows,
    bev_pool_sorted,
    precompute_bev_chunks,
)
from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_splat import (
    bev_scatter_add,
)

INTERPRET = jax.default_backend() == "cpu"


def _random_case(rng, p, num_cells, c, frac_invalid=0.1):
    ids = rng.randint(0, num_cells, p).astype(np.int32)
    ids[rng.rand(p) < frac_invalid] = -1
    feats = rng.randn(p, c).astype(np.float32)
    return ids, feats


@pytest.mark.parametrize(
    "p,num_cells,c",
    [
        (1000, 2500, 128),   # 50x50 grid
        (4000, 10000, 128),  # 100x100 grid
    ],
)
def test_bev_pool_matches_xla_scatter(p, num_cells, c):
    rng = np.random.RandomState(0)
    ids, feats = _random_case(rng, p, num_cells, c)

    want = np.asarray(
        bev_scatter_add(feats[None], ids[None], num_cells)[0]
    )

    plan = precompute_bev_chunks(ids, num_cells)
    got = np.asarray(
        bev_pool_sorted(
            jnp.asarray(feats),
            jnp.asarray(plan["point_idx"]),
            jnp.asarray(plan["local_ids"]),
            jnp.asarray(plan["block_idx"]),
            num_cells=num_cells,
            num_cells_pad=plan["num_cells_pad"],
            interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_bev_pool_dense_cell_reuse():
    """Many points per cell (the realistic frustum case: D depths collapse
    onto few cells near the ego) — chunk spans stay < window."""
    rng = np.random.RandomState(1)
    p, num_cells, c = 8000, 2500, 64
    ids = rng.randint(0, 50, p).astype(np.int32)  # extreme reuse
    feats = rng.randn(p, c).astype(np.float32)
    want = np.asarray(bev_scatter_add(feats[None], ids[None], num_cells)[0])
    plan = precompute_bev_chunks(ids, num_cells)
    got = np.asarray(
        bev_pool_sorted(
            jnp.asarray(feats),
            jnp.asarray(plan["point_idx"]),
            jnp.asarray(plan["local_ids"]),
            jnp.asarray(plan["block_idx"]),
            num_cells=num_cells,
            num_cells_pad=plan["num_cells_pad"],
            interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


def test_bev_pool_rows_batched():
    rng = np.random.RandomState(2)
    x, p, num_cells, c = 3, 600, 2500, 64
    plans, feats, wants = [], [], []
    for _ in range(x):
        ids, f = _random_case(rng, p, num_cells, c)
        plans.append(precompute_bev_chunks(ids, num_cells))
        feats.append(f)
        wants.append(
            np.asarray(bev_scatter_add(f[None], ids[None], num_cells)[0])
        )
    got = np.asarray(
        bev_pool_rows(
            jnp.asarray(np.stack(feats)),
            jnp.asarray(np.stack([pl["point_idx"] for pl in plans])),
            jnp.asarray(np.stack([pl["local_ids"] for pl in plans])),
            jnp.asarray(np.stack([pl["block_idx"] for pl in plans])),
            num_cells=num_cells,
            num_cells_pad=plans[0]["num_cells_pad"],
            interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got, np.stack(wants), atol=1e-4, rtol=1e-5)


def test_precompute_chunks_all_out_of_range():
    plan = precompute_bev_chunks(
        np.full(100, -1, np.int32), num_cells=2500
    )
    assert (plan["local_ids"] == -1).all()
    assert (plan["point_idx"] == 100).all()


def test_precompute_chunks_window_invariant():
    rng = np.random.RandomState(3)
    ids, _ = _random_case(rng, 2000, 10000, 8)
    plan = precompute_bev_chunks(ids, 10000, chunk_points=128, window=128)
    li = plan["local_ids"]
    assert li.max() < 128
    # every real point appears exactly once
    real = plan["point_idx"][plan["point_idx"] < 2000]
    valid_count = int((ids >= 0).sum())
    assert len(np.unique(real)) == len(real) == valid_count


def test_bev_pool_weighted_matches_lift_splat():
    """The fused weighted pool equals the reference lift-splat (softmax-
    weighted lifted-tensor scatter-add) at frustum-like shapes."""
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_pool_pallas import (
        bev_pool_weighted,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_splat import (
        lift_splat,
    )

    rng = np.random.RandomState(4)
    fh, fw, c, d, num_cells = 8, 22, 32, 10, 2500
    hw = fh * fw
    feats = rng.randn(1, fh, fw, c).astype(np.float32)
    logits = rng.randn(1, fh, fw, d).astype(np.float32)
    cells = rng.randint(0, num_cells, (d, fh, fw)).astype(np.int32)
    cells[rng.rand(d, fh, fw) < 0.15] = -1

    want = np.asarray(
        lift_splat(
            jnp.asarray(feats), jnp.asarray(logits), jnp.asarray(cells),
            num_cells,
        )[0]
    )

    plan = precompute_bev_chunks(cells.reshape(-1), num_cells)
    # weights laid out (D, HW) flattened == the cells flattening
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    weights = probs[0].reshape(hw, d).T.reshape(-1)  # (D*HW,)
    got = np.asarray(
        bev_pool_weighted(
            jnp.asarray(feats.reshape(hw, c)),
            jnp.asarray(weights),
            jnp.asarray(plan["point_idx"]),
            jnp.asarray(plan["local_ids"]),
            jnp.asarray(plan["block_idx"]),
            num_cells=num_cells,
            num_cells_pad=plan["num_cells_pad"],
            interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_bev_pool_weighted_rows_matches_matmul_rows():
    """Batched fused pool equals lift_splat_matmul_rows (the shipped fast
    XLA formulation) row for row."""
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_pool_pallas import (
        bev_pool_weighted_rows,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_splat import (
        lift_splat_matmul_rows,
    )

    rng = np.random.RandomState(5)
    x, fh, fw, c, d, num_cells = 2, 6, 12, 16, 8, 900
    hw = fh * fw
    feats = rng.randn(x, fh, fw, c).astype(np.float32)
    logits = rng.randn(x, fh, fw, d).astype(np.float32)
    cells = rng.randint(-1, num_cells, (x, d, fh, fw)).astype(np.int32)

    want = np.asarray(
        lift_splat_matmul_rows(
            jnp.asarray(feats), jnp.asarray(logits),
            jnp.asarray(cells.reshape(x, -1)), num_cells,
        )
    )

    plans = [
        precompute_bev_chunks(cells[i].reshape(-1), num_cells)
        for i in range(x)
    ]
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    weights = np.stack(
        [probs[i].reshape(hw, d).T.reshape(-1) for i in range(x)]
    )
    got = np.asarray(
        bev_pool_weighted_rows(
            jnp.asarray(feats.reshape(x, hw, c)),
            jnp.asarray(weights),
            jnp.asarray(np.stack([p["point_idx"] for p in plans])),
            jnp.asarray(np.stack([p["local_ids"] for p in plans])),
            jnp.asarray(np.stack([p["block_idx"] for p in plans])),
            num_cells=num_cells,
            num_cells_pad=plans[0]["num_cells_pad"],
            interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)
