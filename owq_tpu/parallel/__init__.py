from .mesh import DP_AXIS, TP_AXIS, make_mesh
from .partition import (
    local_config,
    make_tp_decode,
    make_tp_forward,
    make_tp_train_step,
    param_pspecs,
    place_params,
    shard_model_tp,
)
