from carla_driving_rl_agent_tpu.utils import math  # noqa: F401
from carla_driving_rl_agent_tpu.utils import activations  # noqa: F401
from carla_driving_rl_agent_tpu.utils.schedules import DynamicParameter  # noqa: F401
from carla_driving_rl_agent_tpu.utils.optimizers import get_optimizer_by_name, OPTIMIZERS  # noqa: F401
