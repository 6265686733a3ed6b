"""Rasterizer tests: XLA renderer semantics + Pallas kernel equivalence
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.envs import town as town_mod
from carla_driving_rl_agent_tpu.ops import rasterizer as R
from carla_driving_rl_agent_tpu.ops import rasterizer_pallas as RP


@pytest.fixture(scope="module")
def inputs():
    t = town_mod.get_town("Town02")
    spawn = t.spawn_xy[3]
    yaw = t.spawn_yaw[3]
    return R.RenderInputs(
        edges_xy=jnp.asarray(t.edges_xy), num_edges=jnp.asarray(len(t.edges_xy)),
        buildings=jnp.asarray(t.buildings),
        junctions=jnp.asarray(t.junction_xy),
        num_junctions=jnp.asarray(len(t.junction_xy)),
        ego_xy=jnp.asarray(spawn), ego_yaw=jnp.asarray(yaw),
        veh_xy=jnp.asarray(spawn[None] + np.asarray([[12.0, 0.0]])),
        veh_yaw=jnp.asarray([yaw]), veh_active=jnp.ones(1),
        ped_xy=jnp.asarray(spawn[None] + np.asarray([[8.0, 3.0]])),
        ped_active=jnp.ones(1),
        weather=jnp.asarray([0.0, 0.1, 0.0, 0.0, 0.0]),
    )


class TestXLARenderer:
    def test_shapes_and_content(self, inputs):
        img = np.asarray(R.render_cameras(inputs, quality="full"))
        assert img.shape == (90, 360, 3)
        assert img.dtype == np.uint8
        assert img.std() > 10, "image should have structure"
        # sky on top rows, ground at bottom
        assert img[:10].mean() != img[-10:].mean()

    def test_weather_changes_image(self, inputs):
        clear = np.asarray(R.render_cameras(inputs, quality="full"), np.int32)
        rainy = inputs._replace(weather=jnp.asarray([1.0, 0.9, 0.9, 0.9, 0.18]))
        wet = np.asarray(R.render_cameras(rainy, quality="full"), np.int32)
        assert np.abs(clear - wet).mean() > 5.0

    def test_fast_quality_close_to_full(self, inputs):
        full = np.asarray(R.render_cameras(inputs, quality="full"), np.float32)
        fast = np.asarray(R.render_cameras(inputs, quality="fast"), np.float32)
        assert fast.shape == full.shape
        # same scene structure (correlation, not pixel equality)
        c = np.corrcoef(full.ravel(), fast.ravel())[0, 1]
        assert c > 0.8, f"fast render decorrelated from full: {c:.2f}"


class TestPallasRenderer:
    def test_matches_xla_fast_renderer(self, inputs):
        """The Pallas kernel (interpret mode on CPU) must reproduce the XLA
        fast-quality renderer semantics."""
        xla = np.asarray(R.render_cameras(inputs, quality="fast"), np.int32)
        pal = np.asarray(RP.render_cameras_pallas(inputs, interpret=True), np.int32)
        assert pal.shape == xla.shape
        diff = np.abs(pal - xla)
        # small differences allowed: K budgets and tie-breaking match, so
        # virtually all pixels should be identical
        assert (diff <= 2).mean() > 0.99, f"mismatch frac {(diff > 2).mean():.4f}"

    def test_geometry_pack_shape(self, inputs):
        geom = RP.pack_geometry(inputs)
        assert geom.shape == (RP.GEOM_PAD,)
        assert np.all(np.isfinite(np.asarray(geom)))
