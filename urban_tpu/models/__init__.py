from urban_tpu.models.model import (ActorCritic, create_mlp_model,  # noqa: F401
                                    create_sgnn_model)
