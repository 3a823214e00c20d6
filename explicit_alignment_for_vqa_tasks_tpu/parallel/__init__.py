from .gather import gather_predictions_to_host0, metric_psum
from .multihost import maybe_initialize_distributed
from .mesh import (
    batch_sharding,
    make_mesh,
    replicate_params,
    replicated,
    shard_batch,
    shard_lm_params,
    t5_param_specs,
)
from .pipeline import (
    gpipe,
    make_mesh_3d,
    pp_param_specs,
    shard_lm_params_pp,
    t5_forward_loss_pp,
    vct0_caption_loss_pp,
)

__all__ = [
    "batch_sharding",
    "gpipe",
    "make_mesh_3d",
    "pp_param_specs",
    "shard_lm_params_pp",
    "t5_forward_loss_pp",
    "vct0_caption_loss_pp",
    "gather_predictions_to_host0",
    "maybe_initialize_distributed",
    "metric_psum",
    "make_mesh",
    "replicate_params",
    "replicated",
    "shard_batch",
    "shard_lm_params",
    "t5_param_specs",
]
