from urban_tpu.jaxenv.state import (EnvSpec, PlanState,  # noqa: F401
                                    build_env_spec, build_initial_state)
from urban_tpu.jaxenv.step import build_obs, env_step  # noqa: F401
from urban_tpu.jaxenv.rollout import rollout, rollout_bench  # noqa: F401
