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
from .sequence import SP_AXIS, make_sp_prefill
from .pipeline import StagedModel, stage_model
from .multihost import initialize as distributed_initialize, is_primary, pod_mesh
