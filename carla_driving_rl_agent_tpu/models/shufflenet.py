"""ShuffleNet-V2 backbone, weight-shared over the time axis.

Reference: `core/architectures.py:30-173` — every layer object is shared
across the T time_horizon frames (closure-captured keras layers).  Here that
sharing is free: frames are folded into the batch axis (B, T, H, W, C) ->
(B*T, H, W, C) so ONE set of conv weights processes all frames — and the MXU
sees a 4x larger batch, which is exactly how the TPU wants convolutions fed.

Channel table and block counts (4/8/4) match `core/architectures.py:33-40,
164-167`; the exit is a 1x1 conv to `last_channels` + BN/ReLU6 + global
average pooling (`:169-172`).  The CARLA agent uses g=1.0, last_channels=768
(`core/carla_agent.py:63-68`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

BN_EPS = 1e-3  # keras BatchNormalization default (parity with the reference's TF nets)

from carla_driving_rl_agent_tpu.utils.activations import leaky_relu6

CHANNELS = {
    0.5: [48, 96, 192],
    1.0: [116, 232, 464],
    1.5: [176, 352, 704],
    2.0: [244, 488, 976],
    0.75: [82, 164, 328],
    1.25: [146, 292, 584],
    1.75: [210, 420, 840],
}


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """(B, H, W, C) channel shuffle (reference `core/architectures.py:109-118`)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // groups, groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(b, h, w, c)


class _BNAct(nn.Module):
    leak: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.BatchNorm(use_running_average=not training, epsilon=BN_EPS, dtype=self.dtype)(x)
        return leaky_relu6(x, self.leak)


class ShuffleUnit(nn.Module):
    """One ShuffleNet-V2 unit (reference `core/architectures.py:120-145`).

    With fused=True a stride-1 unit dispatches its whole op chain to ONE
    Pallas TPU kernel (ops/shuffle_unit_pallas.py) at apply time: the
    training minibatch phase is activation-bandwidth-bound across ~10 small
    XLA ops per unit, and the fused kernel cuts the HBM round-trips to
    4 reads + 1 write (train) / 1+1 (inference).  Parameter and batch_stats
    trees are IDENTICAL to the flax path (init always runs the flax path;
    the kernel consumes the same subtree), so checkpoints are
    interchangeable; numerics are pinned by tests/test_models.py and
    scripts/smoke_shuffle_fused.py.
    """
    num_channels: int
    stride: int
    leak: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.fused and self.stride == 1 and not self.is_initializing():
            from carla_driving_rl_agent_tpu.ops import shuffle_unit_pallas as sup
            # small maps run the sample-aligned kernels; big early-stage
            # maps (stage-2 (23,90,48): hardware scoped-VMEM OOM, round-4)
            # dispatch to the halo-tiled kernels — supports() covers both
            if sup.supports(x.shape[1], x.shape[2], x.shape[3]):
                return self._fused_call(x, training)
        conv = lambda f, k, s=1: nn.Conv(f, (k, k), strides=(s, s), padding="SAME",
                                         dtype=self.dtype,
                                         kernel_init=nn.initializers.glorot_uniform())
        dwconv = lambda c, s: nn.Conv(c, (3, 3), strides=(s, s), padding="SAME",
                                      feature_group_count=c, dtype=self.dtype,
                                      kernel_init=nn.initializers.glorot_uniform())
        bn = lambda: nn.BatchNorm(use_running_average=not training, epsilon=BN_EPS, dtype=self.dtype)
        bn_act = lambda y: leaky_relu6(bn()(y), self.leak)

        if self.stride == 1:
            shortcut, branch = jnp.split(x, 2, axis=-1)
        else:
            shortcut, branch = x, x
        shortcut_channels = shortcut.shape[-1]

        # 1x1 pw -> BN/act -> 3x3 dw (stride) -> BN -> 1x1 pw -> BN/act
        branch = conv(self.num_channels // 2, 1)(branch)
        branch = bn_act(branch)
        branch = dwconv(branch.shape[-1], self.stride)(branch)
        branch = bn()(branch)
        branch = conv(self.num_channels - shortcut_channels, 1)(branch)
        branch = bn_act(branch)

        if self.stride == 2:
            shortcut = dwconv(shortcut.shape[-1], 2)(shortcut)
            shortcut = bn()(shortcut)
            shortcut = conv(shortcut_channels, 1)(shortcut)
            shortcut = bn_act(shortcut)

        out = jnp.concatenate([shortcut, branch], axis=-1)
        return channel_shuffle(out)

    def _fused_call(self, x, training: bool):
        """Apply-time dispatch to the fused Pallas unit.  Reads the SAME
        param/batch_stats subtree the flax path created at init; in training
        mode folds the kernel's batch statistics into the running averages
        with flax BatchNorm semantics (ra = m*ra + (1-m)*batch)."""
        from carla_driving_rl_agent_tpu.ops import shuffle_unit_pallas as sup
        params = self.variables["params"]
        stats = self.variables["batch_stats"]
        if not training:
            return sup.shuffle_unit_infer(x, params, stats, leak=self.leak)
        out, bstats = sup.shuffle_unit_train(x, params, leak=self.leak)
        m = sup.BN_MOMENTUM
        for i in range(3):
            bn = f"BatchNorm_{i}"
            self.put_variable("batch_stats", bn, {
                "mean": m * stats[bn]["mean"] + (1.0 - m) * bstats[bn]["mean"],
                "var": m * stats[bn]["var"] + (1.0 - m) * bstats[bn]["var"],
            })
        return out


class ShuffleNetV2(nn.Module):
    """Full backbone over (B, T, H, W, C) -> (B, T, last_channels)."""
    g: float = 1.0
    leak: float = 0.0
    last_channels: int = 1024
    dtype: jnp.dtype = jnp.float32
    # dispatch stride-1 units to the fused Pallas TPU kernel (see ShuffleUnit)
    fused_units: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.g in CHANNELS, f"g={self.g} not in {sorted(CHANNELS)}"
        b, t = x.shape[0], x.shape[1]
        x = x.reshape((b * t,) + x.shape[2:]).astype(self.dtype)

        # stem: conv 24f 3x3 s2 (VALID in keras default) + BN/ReLU6 + maxpool 3 s2
        x = nn.Conv(24, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                    kernel_init=nn.initializers.glorot_uniform())(x)
        x = _BNAct(self.leak, self.dtype)(x, training)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        c1, c2, c3 = CHANNELS[self.g]
        for c, blocks in ((c1, 4), (c2, 8), (c3, 4)):
            for i in range(blocks):
                x = ShuffleUnit(num_channels=c, stride=2 if i == 0 else 1,
                                leak=self.leak, dtype=self.dtype,
                                fused=self.fused_units)(x, training)

        x = nn.Conv(self.last_channels, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.glorot_uniform())(x)
        x = _BNAct(self.leak, self.dtype)(x, training)
        x = jnp.mean(x, axis=(1, 2))                      # global average pool
        return x.reshape(b, t, self.last_channels)
