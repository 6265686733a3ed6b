"""Halo-tiled fused ShuffleUnit kernels vs the flax unit (CPU interpret).

The halo mode exists for feature maps whose backward VMEM liveness exceeds
the sample-aligned budget (the real trigger is the stage-2 (23, 90, 48)
map of the 90x360 CARLA input).  These tests force halo mode on a small
geometry by shrinking the module's VMEM_BUDGET so the interpret-mode run
stays affordable, and pick H >> W so row-band tile boundaries fall
MID-IMAGE — the exact case the halo blocks exist for (a sample-aligned
tile never splits an image; a halo tile does, and the depthwise taps must
read real neighbor rows across the split).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_driving_rl_agent_tpu.models.shufflenet import ShuffleUnit
from carla_driving_rl_agent_tpu.ops import shuffle_unit_pallas as sup

N, H, W, C = 2, 64, 8, 16
LEAK = 0.0
SMALL_BUDGET = 2 * 1024 * 1024


@pytest.fixture
def halo_forced(monkeypatch):
    monkeypatch.setattr(sup, "VMEM_BUDGET", SMALL_BUDGET)
    assert not sup.fits_vmem(H, W, C)
    mode, rows_t, n_tiles, _cp, _hp, h_b = sup._layout(N, H, W, C)
    assert mode == "halo"
    # halo covers the backward's double spatial reach, tiles split images
    assert h_b >= 2 * (W + 1)
    assert rows_t % h_b == 0 and rows_t < H * W
    return mode


@pytest.fixture
def problem():
    key = jax.random.PRNGKey(3)
    kx, kp, kg = jax.random.split(key, 3)
    x = jax.random.normal(kx, (N, H, W, C), jnp.float32)
    unit = ShuffleUnit(num_channels=C, stride=1, leak=LEAK)
    variables = unit.init(kp, x, training=False)
    gw = jax.random.normal(kg, (N, H, W, C), jnp.float32)
    return unit, variables, x, gw


def test_stage2_geometry_dispatches_to_halo():
    """The real stage-2 map must be covered by the halo plan at the REAL
    budget (it was the round-4 flax fallback this mode removes)."""
    assert not sup.fits_vmem(23, 90, 48)
    assert sup.supports(23, 90, 48)
    mode, rows_t, _n_tiles, cp, _hp, h_b = sup._layout(64, 23, 90, 48)
    assert mode == "halo"
    assert h_b >= 2 * 91
    # plan respects the shared liveness budget
    assert (rows_t + 2 * h_b) * cp * 4 * sup.LIVE_EST <= sup.VMEM_BUDGET


def test_halo_train_forward_and_stats(halo_forced, problem):
    unit, variables, x, _ = problem
    params, stats = variables["params"], variables["batch_stats"]
    out_f, mut = unit.apply(variables, x, training=True,
                            mutable=["batch_stats"])
    out_p, bstats = sup.shuffle_unit_train(x, params, leak=LEAK,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f),
                               rtol=2e-5, atol=2e-5)
    mom = sup.BN_MOMENTUM
    for i in range(3):
        bn = f"BatchNorm_{i}"
        ra_m = mom * stats[bn]["mean"] + (1 - mom) * bstats[bn]["mean"]
        ra_v = mom * stats[bn]["var"] + (1 - mom) * bstats[bn]["var"]
        np.testing.assert_allclose(np.asarray(ra_m),
                                   np.asarray(mut["batch_stats"][bn]["mean"]),
                                   rtol=1e-5, atol=1e-6, err_msg=bn)
        np.testing.assert_allclose(np.asarray(ra_v),
                                   np.asarray(mut["batch_stats"][bn]["var"]),
                                   rtol=1e-5, atol=1e-6, err_msg=bn)


def test_halo_infer(halo_forced, problem):
    unit, variables, x, _ = problem
    params, stats = variables["params"], variables["batch_stats"]
    out_f = unit.apply(variables, x, training=False)
    out_p = sup.shuffle_unit_infer(x, params, stats, leak=LEAK,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f),
                               rtol=2e-5, atol=2e-5)


def test_halo_gradients(halo_forced, problem):
    unit, variables, x, gw = problem
    params, stats = variables["params"], variables["batch_stats"]

    def loss_f(p, xx):
        out, _ = unit.apply({"params": p, "batch_stats": stats}, xx,
                            training=True, mutable=["batch_stats"])
        return jnp.sum(out * gw)

    def loss_p(p, xx):
        out, _ = sup.shuffle_unit_train(xx, p, leak=LEAK, interpret=True)
        return jnp.sum(out * gw)

    gpf, gxf = jax.grad(loss_f, argnums=(0, 1))(params, x)
    gpp, gxp = jax.grad(loss_p, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gxp), np.asarray(gxf),
                               rtol=3e-5, atol=3e-5)
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gpp)}
    for k, vf in jax.tree_util.tree_leaves_with_path(gpf):
        ks = jax.tree_util.keystr(k)
        scale = max(float(np.abs(np.asarray(vf)).max()), 1.0)
        err = float(np.abs(np.asarray(flat_p[ks]) - np.asarray(vf)).max())
        # 2e-4 absolute floor: Conv_1's bias grad is ~0 (the following BN
        # subtracts means) and the 1024-row f32 batch sums carry ~1e-4
        # accumulation noise — the SAMPLE-aligned kernel measures the same
        # error at this geometry, so this bounds noise, not halo logic.
        assert err <= 2e-4 + 3e-5 * scale, (ks, err, scale)


def test_halo_mxu_bf16_flag(halo_forced, problem):
    """mxu_bf16=True (the real-TPU default) must run in halo mode and stay
    within bf16 rounding of the f32-pass result."""
    unit, variables, x, _ = problem
    params = variables["params"]
    out32, _ = sup.shuffle_unit_train(x, params, leak=LEAK, interpret=True,
                                      mxu_bf16=False)
    out16, _ = sup.shuffle_unit_train(x, params, leak=LEAK, interpret=True,
                                      mxu_bf16=True)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=3e-2, atol=3e-2)
