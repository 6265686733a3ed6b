"""ctypes bindings for the native route planner (route_planner.cpp).

Builds the shared library on first use (g++ is part of the toolchain); falls
back to the pure-python planner in envs/route.py when compilation is
unavailable.  `is_available()` gates usage.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libroute_planner.so")
_lib = None
_build_failed = False


def _ensure_built() -> bool:
    global _lib, _build_failed
    if _lib is not None:
        return True
    if _build_failed:
        return False
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return False

    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.rp_build_bank.restype = ctypes.c_int32
    lib.rp_build_bank.argtypes = [
        ctypes.c_int32, i32p, i32p, i32p, i32p, f32p, i32p, i32p,
        f32p, f32p, i32p, i32p, i32p, i32p, i32p,
        i32p, ctypes.c_int32, i32p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
        f32p, f32p, i32p, i32p, i32p,
    ]
    _lib = lib
    return True


def is_available() -> bool:
    return _ensure_built()


def _ptr(arr: np.ndarray, ct):
    return arr.ctypes.data_as(ctypes.POINTER(ct))


def build_route_bank_native(town, num_routes: int, max_len: int,
                            origin_spawns: Optional[List[int]] = None,
                            min_waypoints: int = 40, seed: int = 42):
    """Native equivalent of envs/route.build_route_bank; returns the same
    RouteBank or None if the library is unavailable."""
    if not _ensure_built():
        return None
    from carla_driving_rl_agent_tpu.envs.route import RouteBank

    # flatten successor lists
    succ_off = np.zeros(len(town.lane_successors) + 1, np.int32)
    for i, s in enumerate(town.lane_successors):
        succ_off[i + 1] = succ_off[i] + len(s)
    succ = np.asarray([x for s in town.lane_successors for x in s], np.int32)
    if succ.size == 0:
        succ = np.zeros(1, np.int32)

    num_lanes = len(town.lane_first_wp)
    wp_xy = np.ascontiguousarray(town.wp_xy, np.float32)
    wp_yaw = np.ascontiguousarray(town.wp_yaw, np.float32)
    wp_lane = np.ascontiguousarray(town.wp_lane, np.int32)
    lane_left = np.ascontiguousarray(town.lane_left, np.int32)
    lane_right = np.ascontiguousarray(town.lane_right, np.int32)
    wp_left = np.ascontiguousarray(town.wp_left, np.int32)
    wp_right = np.ascontiguousarray(town.wp_right, np.int32)
    spawn_wp = np.ascontiguousarray(town.spawn_wp, np.int32)
    lane_len = np.ascontiguousarray(town.lane_length, np.float32)

    origins = (np.ascontiguousarray(origin_spawns, np.int32)
               if origin_spawns else None)

    out_xy = np.zeros((num_routes, max_len, 2), np.float32)
    out_yaw = np.zeros((num_routes, max_len), np.float32)
    out_opt = np.zeros((num_routes, max_len), np.int32)
    out_len = np.zeros((num_routes,), np.int32)
    out_origin = np.zeros((num_routes,), np.int32)

    i32, f32 = ctypes.c_int32, ctypes.c_float
    built = _lib.rp_build_bank(
        num_lanes,
        _ptr(np.ascontiguousarray(town.lane_first_wp, np.int32), i32),
        _ptr(np.ascontiguousarray(town.lane_last_wp, np.int32), i32),
        _ptr(np.ascontiguousarray(town.lane_src, np.int32), i32),
        _ptr(np.ascontiguousarray(town.lane_dst, np.int32), i32),
        _ptr(lane_len, f32), _ptr(succ, i32), _ptr(succ_off, i32),
        _ptr(wp_xy, f32), _ptr(wp_yaw, f32), _ptr(wp_lane, i32),
        _ptr(lane_left, i32), _ptr(lane_right, i32),
        _ptr(wp_left, i32), _ptr(wp_right, i32),
        _ptr(spawn_wp, i32), len(spawn_wp),
        _ptr(origins, i32) if origins is not None else None,
        len(origins) if origins is not None else 0,
        num_routes, max_len, min_waypoints, seed,
        _ptr(out_xy, f32), _ptr(out_yaw, f32), _ptr(out_opt, i32),
        _ptr(out_len, i32), _ptr(out_origin, i32))
    if built <= 0:
        return None
    return RouteBank(xy=out_xy, yaw=out_yaw, option=out_opt, length=out_len,
                     origin_spawn=out_origin, max_len=max_len)
