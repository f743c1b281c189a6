"""Pallas fused cull kernel vs the lax reference implementation
(interpret mode; runs on the CPU backend)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from point_cloud_viewer_tpu.math.geometry import Frustum, Isometry, Perspective
from point_cloud_viewer_tpu.ops.culling import (
    frustum_axes_and_projections,
    frustum_cull_lod_select,
)
from point_cloud_viewer_tpu.ops.culling_pallas import (
    frustum_cull_lod_select_pallas,
)


@pytest.mark.parametrize("k", [100, 1000, 2048])
def test_pallas_matches_lax(k):
    rng = np.random.default_rng(k)
    levels = rng.integers(0, 12, k)
    edges = (500.0 / np.exp2(levels)).astype(np.float32)
    mins = (rng.random((k, 3)) * 500.0 - 250.0).astype(np.float32)
    num_points = rng.integers(0, 100_000, k).astype(np.int32)
    num_points[::13] = 0  # some empty nodes

    # A narrow frustum so the visible set is a strict subset.
    eye = Isometry.from_axis_angle([0, 1, 0], 0.3, translation=[0.0, 0.0, 300.0])
    frustum = Frustum.new(eye, Perspective.from_fov(1.0, 0.4, 1.0, 400.0))
    axes, qmin, qmax = frustum_axes_and_projections(frustum)
    m = frustum.clip_from_query.astype(np.float32)

    _, sizes, visible = frustum_cull_lod_select(
        jnp.asarray(m), jnp.asarray(axes), jnp.asarray(qmin), jnp.asarray(qmax),
        jnp.asarray(mins), jnp.asarray(edges), jnp.asarray(num_points),
    )
    pri_p, vis_p = frustum_cull_lod_select_pallas(
        m, axes, qmin, qmax, mins, edges, num_points, interpret=True
    )
    vis_ref = np.asarray(visible)
    assert 0 < vis_ref.sum() < k  # discriminative scene
    np.testing.assert_array_equal(np.asarray(vis_p), vis_ref)
    np.testing.assert_allclose(
        np.asarray(pri_p)[vis_ref], np.asarray(sizes)[vis_ref], rtol=1e-5, atol=1e-6
    )
    assert np.all(np.asarray(pri_p)[~vis_ref] == -np.inf)


def test_host_cull_matches_device():
    """Native host cull kernel == jitted device kernel (same visible set,
    same sizes to f32 tolerance, same priority order)."""
    import numpy as np
    import jax.numpy as jnp

    from point_cloud_viewer_tpu.math.geometry import Frustum, Isometry, Perspective
    from point_cloud_viewer_tpu.ops.culling import (
        frustum_axes_and_projections,
        frustum_cull_lod_select,
        frustum_cull_lod_select_host,
    )

    rng = np.random.default_rng(9)
    k = 2048
    levels = rng.integers(0, 8, k)
    edges = (100.0 / np.exp2(levels)).astype(np.float32)
    mins = (rng.random((k, 3)) * 100.0).astype(np.float32)
    num_points = rng.integers(0, 100_000, k).astype(np.int32)

    eye = Isometry.from_axis_angle([0, 1, 0], 0.3, translation=[50.0, 50.0, 180.0])
    frustum = Frustum.new(eye, Perspective.from_fov(1.3, 1.2, 0.5, 500.0))
    axes, qmin, qmax = frustum_axes_and_projections(frustum)
    matrix = frustum.clip_from_query.astype(np.float32)

    d_order, d_sizes, d_visible = frustum_cull_lod_select(
        jnp.asarray(matrix), jnp.asarray(axes), jnp.asarray(qmin),
        jnp.asarray(qmax), jnp.asarray(mins), jnp.asarray(edges),
        jnp.asarray(num_points),
    )
    h_order, h_sizes, h_visible = frustum_cull_lod_select_host(
        matrix, axes, qmin, qmax, mins, edges, num_points
    )
    np.testing.assert_array_equal(np.asarray(d_visible), h_visible)
    np.testing.assert_allclose(np.asarray(d_sizes), h_sizes, rtol=2e-5, atol=2e-6)
    # Order may differ only where f32 priorities tie/are within tolerance:
    # compare the priority SEQUENCE instead of the index permutation.
    pr = np.where(h_visible, h_sizes, -np.inf)
    np.testing.assert_allclose(
        pr[np.asarray(d_order)], pr[h_order], rtol=2e-5, atol=2e-6
    )


def test_topk_cull_matches_full_sort_prefix():
    """max_out top-K culling returns the same top-K set (by priority) as
    the full sort."""
    import numpy as np

    from point_cloud_viewer_tpu import native
    from point_cloud_viewer_tpu.math.geometry import (
        Frustum, Isometry, Perspective,
    )
    from point_cloud_viewer_tpu.ops.culling import frustum_axes_and_projections

    if not native.available():
        import pytest

        pytest.skip("native unavailable")
    rng = np.random.default_rng(17)
    k = 50_000
    edges = (100.0 / np.exp2(rng.integers(0, 9, k))).astype(np.float64)
    mins = rng.random((k, 3)) * 100.0
    num_points = rng.integers(0, 1000, k).astype(np.int32)
    eye = Isometry.from_axis_angle([0, 1, 0], 0.3, translation=[50.0, 50.0, 180.0])
    fr = Frustum.new(eye, Perspective.from_fov(1.3, 1.2, 0.5, 500.0))
    axes, qmin, qmax = frustum_axes_and_projections(fr)
    m = fr.clip_from_query

    full_order, sizes, visible = native.cull_lod_select(
        m, axes, qmin, qmax, mins, edges, num_points, dtype=np.float64
    )
    top_order, top_sizes, top_visible = native.cull_lod_select(
        m, axes, qmin, qmax, mins, edges, num_points, dtype=np.float64,
        max_out=500,
    )
    np.testing.assert_array_equal(visible, top_visible)
    pr = np.where(visible, sizes, -np.inf)
    # Same priorities in the same order over the top K.
    np.testing.assert_allclose(pr[top_order[:500]], pr[full_order[:500]])
