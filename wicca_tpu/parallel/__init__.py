from wicca_tpu.parallel.codec import tiled_decode, tiled_encode
from wicca_tpu.parallel.mesh import batch_sharding, data_mesh, make_mesh, tile_sharding
from wicca_tpu.parallel.model_parallel import (
    model_mesh,
    moe_apply,
    pp_apply,
    tp_mlp_apply,
)
from wicca_tpu.parallel.tiled import tiled_dwt2, tiled_icon, tiled_idwt2, tiled_stats
