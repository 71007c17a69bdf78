"""Multi-chip parallelism: device meshes, halo exchange, sharded pipelines."""

from .mesh import create_mesh, batch_sharding
from .halo import halo_exchange, halo_exchange_2d
from .pipeline import (
    sharded_analysis_step,
    sharded_production_pipeline,
    sharded_tvd,
    sharded_tvd_2d,
)
from .tpfa import sharded_tpfa_cg
from .beckmann import sharded_beckmann_newton
from .warp import sharded_warp
from .wasserstein import batched_wasserstein, sharded_wasserstein_batch
