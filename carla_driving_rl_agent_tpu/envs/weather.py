"""Weather presets.

The reference samples carla.WeatherParameters presets at reset
(`core/carla_env.py:214-221`); the curriculum's 7 "light" training presets
and the 7 held-out test presets are listed in `core/learning.py:390-398` and
`core/learning.py:513-524`.  Here each preset is a small vector of rendering
parameters consumed by the rasterizer (sky color, light level, fog, rain),
so weather visibly changes the camera image (the generalization axis the
curriculum tests).
"""

from __future__ import annotations

import numpy as np

# columns: sun_altitude (0 noon .. 1 sunset), cloudiness, precipitation, wetness, fog
_PRESETS = {
    "ClearNoon":       (0.0, 0.05, 0.0, 0.0, 0.00),
    "ClearSunset":     (1.0, 0.05, 0.0, 0.0, 0.00),
    "CloudyNoon":      (0.0, 0.80, 0.0, 0.0, 0.02),
    "CloudySunset":    (1.0, 0.80, 0.0, 0.0, 0.02),
    "WetNoon":         (0.0, 0.20, 0.0, 0.6, 0.02),
    "WetSunset":       (1.0, 0.20, 0.0, 0.6, 0.02),
    "WetCloudyNoon":   (0.0, 0.80, 0.0, 0.6, 0.04),
    "WetCloudySunset": (1.0, 0.80, 0.0, 0.6, 0.04),
    "SoftRainNoon":    (0.0, 0.70, 0.3, 0.5, 0.05),
    "SoftRainSunset":  (1.0, 0.70, 0.3, 0.5, 0.05),
    "MidRainyNoon":    (0.0, 0.85, 0.6, 0.7, 0.10),
    "MidRainSunset":   (1.0, 0.85, 0.6, 0.7, 0.10),
    "HardRainNoon":    (0.0, 0.95, 0.9, 0.9, 0.18),
    "HardRainSunset":  (1.0, 0.95, 0.9, 0.9, 0.18),
}

WEATHER_NAMES = list(_PRESETS)
WEATHER_PARAMS = np.asarray([_PRESETS[n] for n in WEATHER_NAMES], np.float32)

# training weathers: the 7 "light" presets (reference core/learning.py:390-398)
TRAIN_WEATHERS = ["ClearNoon", "ClearSunset", "CloudyNoon", "SoftRainNoon",
                  "SoftRainSunset", "WetNoon", "WetSunset"]
# evaluation test weathers: 7 held-out presets (reference core/learning.py:513-524)
TEST_WEATHERS = ["CloudySunset", "HardRainNoon", "HardRainSunset", "MidRainSunset",
                 "MidRainyNoon", "WetCloudyNoon", "WetCloudySunset"]


def weather_ids(names) -> np.ndarray:
    return np.asarray([WEATHER_NAMES.index(n) for n in names], np.int32)


TRAIN_WEATHER_IDS = weather_ids(TRAIN_WEATHERS)
TEST_WEATHER_IDS = weather_ids(TEST_WEATHERS)
