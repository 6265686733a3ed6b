"""Vehicle dynamics: kinematic bicycle model at fixed dt = 1/30 s.

Replaces UE4/PhysX vehicle simulation behind the CARLA RPC boundary
(reference `rl/environments/carla/environment.py:459-485` applies a
carla.VehicleControl and ticks the server).  The control semantics preserved:

  * actions_to_control incl. `throttle_as_desired_speed` PI-like mapping to
    a 0..100 km/h target — reference `core/carla_env.py:141-180`
  * steer in [-1, 1] scales the front-wheel angle; reverse gear optional
    (`disable_reverse` — reference `environment.py:1060-1069`)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DT = 1.0 / 30.0              # fixed_delta_seconds (reference environment.py:42-45,74-77)
WHEELBASE = 2.9              # m
LR = 1.45                    # rear-axle to CoM
MAX_STEER_ANGLE = 0.6109     # 35 deg front wheel at steer=1
MAX_ACCEL = 3.8              # m/s^2 full throttle
MAX_BRAKE = 8.0              # m/s^2 full brake
ROLL_DRAG = 0.08             # 1/s rolling+aero drag coefficient (on v)
QUAD_DRAG = 0.0015           # 1/m aero drag (on v^2)
MS_TO_KMH = 3.6


class VehicleControl(NamedTuple):
    """Mirror of carla.VehicleControl's fields used by the reference."""
    throttle: jax.Array   # [0, 1]
    brake: jax.Array      # [0, 1]
    steer: jax.Array      # [-1, 1]
    reverse: jax.Array    # bool as float


def speed_kmh(v_ms: jax.Array) -> jax.Array:
    """3.6 * |v| — reference `tools/utils.py` `speed()`."""
    return jnp.abs(v_ms) * MS_TO_KMH


def actions_to_control(actions: jax.Array, current_speed_ms: jax.Array,
                       throttle_as_desired_speed: bool = True,
                       disable_reverse: bool = True,
                       range_throttle=(0.0, 1.0), range_brake=(0.0, 1.0),
                       range_steer=(-1.0, 1.0)) -> VehicleControl:
    """Map agent actions [-1,1]^2 to a control (reference `core/carla_env.py:141-180`).

    actions[0] > 0 -> throttle, < 0 -> brake; actions[1] -> steer.
    With `throttle_as_desired_speed`, actions[0] encodes a target speed
    (a0+1)/2 * 100 km/h and throttle/brake are proportional errors.
    """
    a0 = actions[..., 0]
    a1 = actions[..., 1]
    throttle = jnp.where(a0 > 0, a0, 0.0)
    brake = jnp.where(a0 < 0, -a0, 0.0)
    steer = a1
    # 3-action envs carry a reverse-gear channel (reference OneCamera env,
    # environment.py:840,1060-1069); stages disable it (disable_reverse=True)
    if actions.shape[-1] >= 3 and not disable_reverse:
        reverse_flag = (actions[..., 2] > 0).astype(jnp.float32)
    else:
        reverse_flag = jnp.zeros_like(a0)

    if throttle_as_desired_speed:
        desired = (a0 + 1.0) / 2.0 * 100.0                       # km/h
        current = current_speed_ms * MS_TO_KMH
        throttle = jnp.where(current < desired, (desired - current) / 100.0, 0.0)
        brake = jnp.where(current > desired, (current - desired) / 100.0, 0.0)

    throttle = jnp.clip(throttle, range_throttle[0], range_throttle[1])
    brake = jnp.clip(brake, range_brake[0], range_brake[1])
    steer = jnp.clip(steer, range_steer[0], range_steer[1])
    return VehicleControl(throttle=throttle, brake=brake, steer=steer,
                          reverse=reverse_flag)


def step_bicycle(x: jax.Array, y: jax.Array, yaw: jax.Array, v: jax.Array,
                 control: VehicleControl, dt: float = DT):
    """One kinematic-bicycle integration step.

    v >= 0 (reverse handled by sign flip when enabled). Returns new (x, y, yaw, v).
    """
    accel = control.throttle * MAX_ACCEL - control.brake * MAX_BRAKE
    drag = ROLL_DRAG * v + QUAD_DRAG * v * v
    v_new = jnp.maximum(v + (accel - drag) * dt, 0.0)

    delta = control.steer * MAX_STEER_ANGLE
    beta = jnp.arctan(jnp.tan(delta) * (LR / WHEELBASE))
    v_mid = 0.5 * (v + v_new)
    direction = 1.0 - 2.0 * control.reverse          # reverse gear flips motion
    x_new = x + direction * v_mid * jnp.cos(yaw + beta) * dt
    y_new = y + direction * v_mid * jnp.sin(yaw + beta) * dt
    yaw_new = yaw + direction * (v_mid / LR) * jnp.sin(beta) * dt
    yaw_new = jnp.arctan2(jnp.sin(yaw_new), jnp.cos(yaw_new))
    return x_new, y_new, yaw_new, v_new


def tgather(arr: jax.Array, town_id, *idx):
    """`arr[town_id, *idx]` with the leading town axis folded away STATICALLY
    when the bank holds a single town (the bench / stage s1-s3 / imitation
    configs): the per-world two-level gather becomes a free slice plus a
    one-level gather.  Multi-town banks keep the fused `arr[town_id, ...]`
    form — materializing `arr[town_id]` first would copy whole padded town
    tables per world under vmap (the round-1 TPU-gather poison)."""
    lead = 0 if arr.shape[0] == 1 else town_id
    return arr[(lead,) + idx] if idx else arr[lead]
