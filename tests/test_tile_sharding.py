"""Instance-space (tile) sharding prototype (docs/tile_sharding.md):
a single render split into tile-row strips across the 8 virtual
devices must match the single-device render, and per-strip backward
partials must psum to the exact full gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gaussianeditor_tpu.ops.render import render
from gaussianeditor_tpu.parallel.tile_sharded import (
    make_tile_sharded_render,
    render_strip,
)
from tests.helpers import make_camera, random_scene

MI = 4096


@pytest.fixture(scope="module")
def setup():
    scene = random_scene(120, seed=3)
    cam = make_camera(64, 64)  # 4x4 tiles
    return scene, cam


def test_strips_match_full_render(setup):
    scene, cam = setup
    mesh = Mesh(np.array(jax.devices()[:4]), ("tile",))
    fn = make_tile_sharded_render(
        mesh, scene.capacity, cam, max_instances_per_shard=MI,
    )
    bg = jnp.asarray([0.2, 0.1, 0.4], jnp.float32)
    color, ovf = fn(scene, bg)
    assert not bool(ovf)
    ref = render(scene, cam, bg, impl="pallas", max_instances=MI)
    np.testing.assert_allclose(
        np.asarray(color), np.asarray(ref.color), atol=1e-5
    )


def test_strip_gradients_psum_to_full(setup):
    scene, cam = setup
    mesh = Mesh(np.array(jax.devices()[:4]), ("tile",))
    gy_local = 1
    probe = jax.random.normal(jax.random.key(0), (64, 64, 3))

    def sharded_loss(params):
        def _shard(params, probe):
            d = jax.lax.axis_index("tile")
            s = scene.replace(params=params)
            color, final_T, _ = render_strip(
                s, cam, d * gy_local, gy_local, max_instances=MI,
            )
            pr = jax.lax.dynamic_slice_in_dim(probe, d * 16, 16, axis=0)
            loss = jnp.sum(color * pr) + 0.05 * jnp.sum(final_T)
            return jax.lax.psum(loss, "tile")

        return jax.shard_map(
            _shard, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
            check_vma=False,
        )(params, probe)

    def full_loss(params):
        out = render(scene.replace(params=params), cam, jnp.zeros(3),
                     impl="pallas", max_instances=MI)
        return jnp.sum(out.color * probe) + 0.05 * jnp.sum(out.final_T)

    gs = jax.jit(jax.grad(sharded_loss))(scene.params)
    gf = jax.jit(jax.grad(full_loss))(scene.params)
    for f in ("xyz", "opacity_raw", "log_scales", "quats", "features_dc"):
        a, b = np.asarray(getattr(gs, f)), np.asarray(getattr(gf, f))
        den = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / den, b / den, atol=1e-3)
