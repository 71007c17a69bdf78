"""Multi-chip parallelism: device meshes, halo exchange, sharded pipelines."""

from .mesh import create_mesh, batch_sharding
from .halo import halo_exchange
from .pipeline import sharded_analysis_step, sharded_tvd
from .tpfa import sharded_tpfa_cg
from .wasserstein import batched_wasserstein, sharded_wasserstein_batch
