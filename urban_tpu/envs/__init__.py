from urban_tpu.envs.city import CityEnv, InfeasibleActionError  # noqa: F401
from urban_tpu.envs.plan_client import PlanClient  # noqa: F401
from urban_tpu.envs.observation import ObservationExtractor  # noqa: F401
